"""CTC decoders: batched greedy collapse and on-device beam search.

TPU-native replacement for ``tf.nn.ctc_beam_search_decoder``
(/root/reference/models/AcousticModel.py:312).  The reference called a host
C++ beam search returning sparse tensors; here both decoders are pure JAX
with static shapes, fully batched, and jit-compatible so they can run
inside the eval step on device.

Beam search design (prefix beam search, Graves 2006 formulation):
  * Beam state is (hash, last-char, p_blank, p_nonblank) per beam — the
    prefix itself is NOT materialized per candidate.  Each step emits a
    (parent, appended-char) record into a trellis; prefixes are rebuilt by a
    reverse scan at the end.  This keeps the per-step working set at
    (B, K*(V+1)) scalars instead of (B, K*(V+1), U) prefix tensors.
  * Equal prefixes across beams are merged exactly: candidates are sorted
    by rolling prefix hash and their probabilities combined with a
    segmented log-sum-exp (associative scan), then top-K selected.
  * Frames past an example's true length freeze the beam state, so one
    compiled program handles ragged batches.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30
_HASH_MULT = np.uint32(1000003)
_HASH_MULT2 = np.uint32(8191)


def greedy_decode(
    logits: jnp.ndarray,        # (T, B, V)
    logit_lengths: jnp.ndarray, # (B,)
    blank_id: int = -1,
    max_output: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-path decode: argmax, collapse repeats, strip blanks.

    Returns (labels (B, U) padded with -1, lengths (B,)); U = max_output or T.
    """
    T, B, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    U = max_output or T

    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)     # (T, B)
    prev = jnp.concatenate([jnp.full((1, B), -1, jnp.int32), best[:-1]], axis=0)
    valid = jnp.arange(T)[:, None] < logit_lengths[None, :]
    keep = valid & (best != blank_id) & (best != prev)       # (T, B)

    # Left-compact kept symbols into fixed-width rows.
    pos = jnp.cumsum(keep, axis=0) - 1                       # output slot per t
    out = jnp.full((B, U), -1, jnp.int32)
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], (T, B))
    b_idx = jnp.broadcast_to(jnp.arange(B)[None, :], (T, B))
    slot = jnp.where(keep, pos, U)                           # dump masked to U
    out = jnp.pad(out, ((0, 0), (0, 1)))                     # overflow column
    out = out.at[b_idx.ravel(), jnp.clip(slot, 0, U).ravel()].set(
        jnp.where(keep, best, -1).ravel(), mode="drop"
    )
    out = out[:, :U]
    lengths = jnp.minimum(jnp.sum(keep, axis=0), U).astype(jnp.int32)
    return out, lengths


class BeamState(NamedTuple):
    hash: jnp.ndarray      # (B, K) uint32 prefix identity (primary)
    hash2: jnp.ndarray     # (B, K) uint32 prefix identity (secondary)
    last: jnp.ndarray      # (B, K) int32 last char (blank if empty)
    p_b: jnp.ndarray       # (B, K) log P(prefix, ending in blank)
    p_nb: jnp.ndarray      # (B, K) log P(prefix, ending in non-blank)


def _segmented_logsumexp_pair(same_as_prev, pb, pnb):
    """Merge consecutive equal-key runs via a segmented associative scan.

    ``same_as_prev[i]`` marks element i as belonging to the same run as
    i-1.  Run totals accumulate at each run's last element; callers discard
    non-tail elements.  Standard segmented-scan trick: carry (value, flag)
    where flag means "a segment boundary was crossed inside this span".
    """
    seg_start = ~same_as_prev

    def combine(a, b):
        a_pb, a_pnb, a_flag = a
        b_pb, b_pnb, b_flag = b
        pb_out = jnp.where(b_flag, b_pb, jnp.logaddexp(a_pb, b_pb))
        pnb_out = jnp.where(b_flag, b_pnb, jnp.logaddexp(a_pnb, b_pnb))
        return pb_out, pnb_out, a_flag | b_flag

    pb_acc, pnb_acc, _ = jax.lax.associative_scan(
        combine, (pb, pnb, seg_start), axis=-1
    )
    is_tail = jnp.concatenate(
        [~same_as_prev[..., 1:],
         jnp.ones_like(same_as_prev[..., :1])], axis=-1
    )
    return pb_acc, pnb_acc, is_tail


def beam_search_decode(
    logits: jnp.ndarray,        # (T, B, V)
    logit_lengths: jnp.ndarray, # (B,)
    beam_width: int = 16,
    blank_id: int = -1,
    max_output: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prefix beam search. Returns (labels (B, K, U), lengths (B, K),
    scores (B, K)) sorted best-first; labels padded with -1."""
    T, B, V = logits.shape
    K = beam_width
    if blank_id < 0:
        blank_id = V + blank_id
    U = max_output or T
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    init = BeamState(
        hash=jnp.zeros((B, K), jnp.uint32),
        hash2=jnp.zeros((B, K), jnp.uint32),
        last=jnp.full((B, K), blank_id, jnp.int32),
        p_b=jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF)
        * jnp.ones((B, 1)),
        p_nb=jnp.full((B, K), NEG_INF),
    )

    chars = jnp.arange(V, dtype=jnp.int32)

    def step(state, inp):
        lp_t, t = inp                                   # lp_t: (B, V)
        total = jnp.logaddexp(state.p_b, state.p_nb)    # (B, K)

        # --- candidates -------------------------------------------------
        # Slot 0 per beam: "stay" (emit blank, or repeat last char).
        stay_pb = total + lp_t[:, blank_id][:, None]
        lp_last = jnp.take_along_axis(lp_t, state.last, axis=1)  # (B, K)
        stay_pnb = state.p_nb + lp_last

        # Slots 1..V: extend with char c (blank slot masked out).
        chars_u = chars[None, None, :].astype(jnp.uint32) + np.uint32(1)
        ext_hash = (state.hash[:, :, None] * _HASH_MULT) ^ chars_u
        ext_hash2 = (state.hash2[:, :, None] * _HASH_MULT2) + chars_u
        same_as_last = chars[None, None, :] == state.last[:, :, None]
        base = jnp.where(same_as_last, state.p_b[:, :, None], total[:, :, None])
        ext_pnb = base + lp_t[:, None, :]
        is_blank = chars[None, None, :] == blank_id
        ext_pnb = jnp.where(is_blank, NEG_INF, ext_pnb)
        ext_pb = jnp.full_like(ext_pnb, NEG_INF)

        # --- flatten ----------------------------------------------------
        C = K * (V + 1)
        cand_hash = jnp.concatenate(
            [state.hash[:, :, None], ext_hash], axis=2
        ).reshape(B, C)
        cand_hash2 = jnp.concatenate(
            [state.hash2[:, :, None], ext_hash2], axis=2
        ).reshape(B, C)
        cand_last = jnp.concatenate(
            [state.last[:, :, None],
             jnp.broadcast_to(chars[None, None, :], (B, K, V))], axis=2
        ).reshape(B, C)
        cand_pb = jnp.concatenate([stay_pb[:, :, None], ext_pb], axis=2).reshape(B, C)
        cand_pnb = jnp.concatenate([stay_pnb[:, :, None], ext_pnb], axis=2).reshape(B, C)
        cand_parent = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, V + 1)
        ).reshape(B, C)
        cand_char = jnp.concatenate(
            [jnp.full((B, K, 1), -1, jnp.int32),
             jnp.broadcast_to(chars[None, None, :], (B, K, V))], axis=2
        ).reshape(B, C)

        # --- merge equal prefixes --------------------------------------
        # Lexicographic sort on (hash, hash2) via two stable argsorts; a
        # 64-bit combined identity makes accidental merges negligible.
        o2 = jnp.argsort(cand_hash2, axis=-1, stable=True)
        h1_tmp = jnp.take_along_axis(cand_hash, o2, axis=-1)
        o1 = jnp.argsort(h1_tmp, axis=-1, stable=True)
        order = jnp.take_along_axis(o2, o1, axis=-1)
        g = lambda x: jnp.take_along_axis(x, order, axis=-1)
        s_hash, s_hash2 = g(cand_hash), g(cand_hash2)
        s_pb, s_pnb = g(cand_pb), g(cand_pnb)
        s_last, s_parent, s_char = g(cand_last), g(cand_parent), g(cand_char)
        same_as_prev = jnp.concatenate(
            [jnp.zeros_like(s_hash[..., :1], dtype=bool),
             (s_hash[..., 1:] == s_hash[..., :-1])
             & (s_hash2[..., 1:] == s_hash2[..., :-1])], axis=-1
        )
        m_pb, m_pnb, is_tail = _segmented_logsumexp_pair(same_as_prev, s_pb, s_pnb)
        score = jnp.where(is_tail, jnp.logaddexp(m_pb, m_pnb), NEG_INF)

        # For a merged run, keep the tail element's (parent, char): ties in
        # reconstruction are irrelevant because the prefixes are identical.
        _, top_idx = jax.lax.top_k(score, K)            # (B, K)
        gk = lambda x: jnp.take_along_axis(x, top_idx, axis=-1)
        # Filler slots (masked non-tail candidates) still carry partial run
        # accumulations in m_pb/m_pnb; kill them or they become ghost beams
        # that double-count the same prefix on later steps.
        dead = gk(score) <= NEG_INF / 2
        new = BeamState(
            hash=gk(s_hash), hash2=gk(s_hash2), last=gk(s_last),
            p_b=jnp.where(dead, NEG_INF, gk(m_pb)),
            p_nb=jnp.where(dead, NEG_INF, gk(m_pnb)),
        )
        parent = gk(s_parent)
        char = gk(s_char)

        # Freeze finished examples.
        live = (t < logit_lengths)[:, None]
        merged = BeamState(
            hash=jnp.where(live, new.hash, state.hash),
            hash2=jnp.where(live, new.hash2, state.hash2),
            last=jnp.where(live, new.last, state.last),
            p_b=jnp.where(live, new.p_b, state.p_b),
            p_nb=jnp.where(live, new.p_nb, state.p_nb),
        )
        parent = jnp.where(live, parent, jnp.arange(K, dtype=jnp.int32)[None, :])
        char = jnp.where(live, char, -1)
        return merged, (parent, char)

    final, (parents, emitted) = jax.lax.scan(
        step, init, (log_probs, jnp.arange(T))
    )

    # --- backtrack ------------------------------------------------------
    scores = jnp.logaddexp(final.p_b, final.p_nb)       # (B, K)
    order = jnp.argsort(-scores, axis=-1)
    scores = jnp.take_along_axis(scores, order, axis=-1)

    def back(carry, inp):
        beam_idx = carry                                 # (B, K)
        parent_t, char_t = inp
        ch = jnp.take_along_axis(char_t, beam_idx, axis=-1)
        nxt = jnp.take_along_axis(parent_t, beam_idx, axis=-1)
        return nxt, ch

    _, chars_rev = jax.lax.scan(
        back, order, (parents, emitted), reverse=True
    )                                                    # (T, B, K) in forward order
    chars_fwd = chars_rev                                # scan(reverse) re-emits forward

    # Left-compact emitted (!= -1) chars into (B, K, U).
    keep = chars_fwd >= 0                                # (T, B, K)
    pos = jnp.cumsum(keep, axis=0) - 1
    lengths = jnp.minimum(jnp.sum(keep, axis=0), U).astype(jnp.int32)
    out = jnp.full((B, K, U + 1), -1, jnp.int32)
    t_sz, b_sz, k_sz = chars_fwd.shape
    b_idx = jnp.broadcast_to(jnp.arange(B)[None, :, None], (T, B, K))
    k_idx = jnp.broadcast_to(jnp.arange(K)[None, None, :], (T, B, K))
    slot = jnp.where(keep, jnp.clip(pos, 0, U), U)
    out = out.at[b_idx.ravel(), k_idx.ravel(), slot.ravel()].set(
        jnp.where(keep, chars_fwd, -1).ravel(), mode="drop"
    )
    return out[:, :, :U], lengths, scores
