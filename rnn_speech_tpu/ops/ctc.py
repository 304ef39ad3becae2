"""CTC loss: log-space forward/backward (alpha/beta) with a custom VJP.

TPU-native replacement for ``tf.nn.ctc_loss`` as used at
/root/reference/models/AcousticModel.py:357 (including the
``ignore_longer_outputs_than_inputs=True`` semantics: examples whose label
is longer than their input emit zero loss and zero gradient).

Design:
  * Dense inputs everywhere — labels are a padded (B, L) int array plus
    lengths, not a sparse tensor; every shape is static under jit.
  * The alpha (forward) recursion runs as a ``lax.scan`` over time with the
    whole (B, S) state lane-vectorized (S = 2L+1 extended states); the beta
    recursion runs only inside the custom backward pass, which assembles
    the exact analytic gradient  softmax - posterior  without storing any
    autodiff residuals beyond log-probs and alpha.
  * Blank is the last class (TF convention; the reference's char map uses
    its final ``_`` entry as the blank).
  * -1e30 stands in for -inf so masked states never produce NaN via inf-inf.

Gradient correctness is pinned against torch.nn.functional.ctc_loss and
finite differences in tests/test_ctc.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _extend_labels(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) interleaved with blanks: [b, l0, b, l1, ..., b]."""
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _log_add3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _shift_right(x: jnp.ndarray, fill: float = NEG_INF, by: int = 1) -> jnp.ndarray:
    if by >= x.shape[-1]:  # S=1 when every label is empty
        return jnp.full_like(x, fill)
    pad = jnp.full(x.shape[:-1] + (by,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-by]], axis=-1)


def _forward_alphas(
    log_probs: jnp.ndarray,     # (T, B, V)
    logit_lengths: jnp.ndarray, # (B,)
    ext: jnp.ndarray,           # (B, S) extended labels
    skip_ok: jnp.ndarray,       # (B, S) bool: s-2 -> s transition allowed
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (alphas (T, B, S), logP (B,))."""
    T, B, V = log_probs.shape
    S = ext.shape[1]

    lp_ext = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(ext[None], (T, B, S)), axis=2
    )                                                    # (T, B, S)

    s_idx = jnp.arange(S)[None, :]
    alpha0 = jnp.where(s_idx < 2, lp_ext[0], NEG_INF)    # states 0 and 1

    def step(alpha, inp):
        lp_t, t = inp
        a1 = _shift_right(alpha, by=1)
        a2 = jnp.where(skip_ok, _shift_right(alpha, by=2), NEG_INF)
        new = _log_add3(alpha, a1, a2) + lp_t
        # Freeze past each example's true input length.
        live = (t < logit_lengths)[:, None]
        new = jnp.where(live, new, alpha)
        return new, new

    _, alphas_rest = jax.lax.scan(
        step, alpha0, (lp_ext[1:], jnp.arange(1, T))
    )
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)

    # Freezing keeps alphas[t] = alphas[T_b-1] for t >= T_b, so the final row
    # holds each example's terminal alphas regardless of its true length.
    return alphas, alphas[-1]


def _terminal_logp(last_alpha, label_lengths):
    B, S = last_alpha.shape
    end = 2 * label_lengths                              # final blank state
    a_end = jnp.take_along_axis(last_alpha, end[:, None], axis=1)[:, 0]
    a_pre = jnp.take_along_axis(
        last_alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_pre = jnp.where(label_lengths > 0, a_pre, NEG_INF)
    return jnp.logaddexp(a_end, a_pre)


def _prepare(labels, blank_id, V):
    labels = jnp.where(labels < 0, blank_id, labels)
    ext = _extend_labels(labels, blank_id)
    # s-2 skip allowed where ext[s] is a real label differing from ext[s-2].
    ext_m2 = _shift_right(ext.astype(jnp.float32), fill=-1.0, by=2).astype(ext.dtype)
    skip_ok = (ext != blank_id) & (ext != ext_m2)
    return ext, skip_ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss(
    logits: jnp.ndarray,         # (T, B, V)
    logit_lengths: jnp.ndarray,  # (B,)
    labels: jnp.ndarray,         # (B, L), padded with -1 (or blank)
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: int = -1,
) -> jnp.ndarray:
    """Per-example CTC negative log-likelihood, shape (B,)."""
    loss, _ = _ctc_fwd_impl(logits, logit_lengths, labels, label_lengths, blank_id)
    return loss


def _ctc_fwd_impl(logits, logit_lengths, labels, label_lengths, blank_id):
    T, B, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext, skip_ok = _prepare(labels, blank_id, V)
    alphas, last = _forward_alphas(log_probs, logit_lengths, ext, skip_ok)
    logp = _terminal_logp(last, label_lengths)

    # ignore_longer_outputs_than_inputs semantics.
    valid = (label_lengths <= logit_lengths) & (logit_lengths > 0)
    loss = jnp.where(valid, -logp, 0.0)
    residuals = (log_probs, alphas, logp, ext, skip_ok, logit_lengths,
                 label_lengths, valid)
    return loss, residuals


def _ctc_fwd(logits, logit_lengths, labels, label_lengths, blank_id):
    return _ctc_fwd_impl(logits, logit_lengths, labels, label_lengths, blank_id)


def _ctc_bwd(blank_id, residuals, g):
    (log_probs, alphas, logp, ext, skip_ok, logit_lengths,
     label_lengths, valid) = residuals
    T, B, V = log_probs.shape
    S = ext.shape[1]
    # blank placement is already baked into the ext/skip_ok residuals

    lp_ext = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(ext[None], (T, B, S)), axis=2
    )

    # Terminal condition for beta at each example's last valid frame.
    s_idx = jnp.arange(S)[None, :]
    end = (2 * label_lengths)[:, None]
    beta_init = jnp.where(
        (s_idx == end) | ((s_idx == end - 1) & (label_lengths[:, None] > 0)),
        0.0,
        NEG_INF,
    )

    def _shift_left(x, fill=NEG_INF, by=1):
        if by >= x.shape[-1]:
            return jnp.full_like(x, fill)
        pad = jnp.full(x.shape[:-1] + (by,), fill, x.dtype)
        return jnp.concatenate([x[..., by:], pad], axis=-1)

    skip_ok_next2 = _shift_left(skip_ok.astype(jnp.float32), fill=0.0, by=2) > 0.5

    def step(beta_next, inp):
        lp_next, t = inp
        # beta_t[s] = logsum over s' in {s, s+1, s+2} of beta_{t+1}[s'] + lp_{t+1}[s']
        term0 = beta_next + lp_next
        b1 = _shift_left(term0, by=1)
        b2 = jnp.where(skip_ok_next2, _shift_left(term0, by=2), NEG_INF)
        beta_t = _log_add3(term0, b1, b2)
        # At t == T_b - 1 the recursion restarts from the terminal condition;
        # for t >= T_b the value is unused (masked in the gradient).
        beta_t = jnp.where((t == logit_lengths - 1)[:, None], beta_init, beta_t)
        return beta_t, beta_t

    # Scan t from T-2 down to 0; betas[T-1] = beta at the last frame index.
    beta_last = jnp.where((logit_lengths == T)[:, None], beta_init, NEG_INF)
    ts = jnp.arange(T - 2, -1, -1)
    _, betas_rev = jax.lax.scan(step, beta_last, (lp_ext[ts + 1], ts))
    betas = jnp.concatenate([betas_rev[::-1], beta_last[None]], axis=0)

    # Posterior over lattice states: gamma = alpha + beta - logP.
    gamma = alphas + betas - logp[None, :, None]

    # Sum posteriors per vocabulary entry: scatter-add over ext ids.
    post = jnp.exp(jnp.minimum(gamma, 0.0))             # (T, B, S)
    onehot = jax.nn.one_hot(ext, V, dtype=post.dtype)    # (B, S, V)
    label_post = jnp.einsum("tbs,bsv->tbv", post, onehot)

    grad = jnp.exp(log_probs) - label_post               # softmax - posterior

    # Mask: frames beyond T_b, invalid examples; scale by incoming cotangent.
    t_mask = (jnp.arange(T)[:, None] < logit_lengths[None, :])[:, :, None]
    grad = jnp.where(t_mask, grad, 0.0)
    grad = grad * jnp.where(valid, 1.0, 0.0)[None, :, None]
    grad = grad * g[None, :, None]
    return (grad.astype(jnp.float32), None, None, None)


ctc_loss.defvjp(_ctc_fwd, _ctc_bwd)


def mean_of(loss_fn, logits, logit_lengths, labels, label_lengths,
            blank_id=-1):
    """Reference-style mean: per-example loss / input length, then batch mean
    (/root/reference/models/AcousticModel.py:361).  Shared by the scan and
    Pallas CTC implementations so the normalization convention cannot
    silently diverge between them."""
    per = loss_fn(logits, logit_lengths, labels, label_lengths, blank_id)
    denom = jnp.maximum(logit_lengths.astype(jnp.float32), 1.0)
    return jnp.mean(per / denom)


def ctc_loss_mean(logits, logit_lengths, labels, label_lengths, blank_id=-1):
    return mean_of(ctc_loss, logits, logit_lengths, labels, label_lengths,
                   blank_id)
