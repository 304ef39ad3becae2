"""CTC decoders: batched greedy collapse and on-device beam search.

TPU-native replacement for ``tf.nn.ctc_beam_search_decoder``
(/root/reference/models/AcousticModel.py:312).  The reference called a host
C++ beam search returning sparse tensors; here both decoders are pure JAX
with static shapes, fully batched, and jit-compatible so they can run
inside the eval step on device.

Beam search design (prefix beam search, Graves 2006 formulation):
  * Beam state is (hash, parent-hash, last-char, p_blank, p_nonblank) per
    beam — the prefix itself is NOT materialized per candidate.  Each step
    emits a (parent, appended-char) record into a trellis; prefixes are
    rebuilt by a reverse scan at the end.  This keeps the per-step working
    set at (B, K*(V+1)) scalars instead of (B, K*(V+1), U) prefix tensors.
  * Equal prefixes are merged exactly and cheaply by structure: among the
    stay/extend candidate set, the only possible duplicate is
    ``stay(i) == extend(j, last_i)`` with ``prefix_j == parent(prefix_i)``,
    so carrying each beam's parent-prefix hash reduces merging to a (K, K)
    identity match — no candidate sort needed.
  * TPU-hostile ops are banned from the hot scan: no gathers
    (``take_along_axis`` costs ~0.5 ms per call inside a scan on real
    hardware) and no scatters.  All selection is one-hot masking +
    reductions, which is exact for both the int32 hashes and the float
    probabilities; the final left-compaction is a co-sort (see
    ``_left_compact``).
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


def _top_k_indices(rank: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k largest entries per row, descending, ties broken
    toward the lowest index — ``lax.top_k``'s exact order.

    Two implementations (RST_BEAM_TOPK=lax|iter): XLA's TopK custom call,
    or k masked argmax passes.  TopK lowers to a sort-shaped program whose
    cost grows with the candidate count C; the iterative form is k cheap
    (B, C) VPU reductions, which wins when k << C (the beam step has
    k = K ~ 8-16 against C = K(V+1) ~ 650-1300 candidates).  Ties: argmax
    returns the lowest index, and masking removes exactly the selected
    slot per pass, so equal values emerge lowest-index-first — identical
    to lax.top_k (pinned by tests/test_decode.py)."""
    import os

    if os.environ.get("RST_BEAM_TOPK", "lax") != "iter":
        _, idx = jax.lax.top_k(rank, k)
        return idx
    C = rank.shape[-1]
    iota = jnp.arange(C, dtype=jnp.int32)

    def one(carry, _):
        cur = carry
        am = jnp.argmax(cur, axis=-1).astype(jnp.int32)      # (B,)
        cur = jnp.where(iota[None, :] == am[:, None], -jnp.inf, cur)
        return cur, am

    _, idx = jax.lax.scan(one, rank, None, length=k)
    return jnp.transpose(idx)                                # (B, k)


def _left_compact(chars: jnp.ndarray, keep: jnp.ndarray, U: int):
    """Left-compact kept symbols along the leading time axis.

    ``chars``/``keep`` are (T, ...); returns (out (..., U) padded with -1,
    lengths (...,)).  Compaction is a stable co-sort on the kept-slot index
    (dropped entries get sentinel T, sorting last) — a scatter would express
    this more directly but lowers to a serial loop on TPU, which made beam
    decoding ~1000x slower than the beam search itself.
    """
    T = chars.shape[0]
    pos = jnp.cumsum(keep, axis=0) - 1                       # output slot per t
    slot = jnp.where(keep, pos, T).astype(jnp.int32)
    # (T, ...) -> (..., T), sort along T by slot, take the first U.
    perm = tuple(range(1, chars.ndim)) + (0,)
    key = jnp.transpose(slot, perm)
    val = jnp.transpose(jnp.where(keep, chars, -1), perm)
    key_sorted, val_sorted = jax.lax.sort((key, val), num_keys=1)
    if U > T:  # honor the requested width even when T can't fill it
        pad = ((0, 0),) * (val_sorted.ndim - 1) + ((0, U - T),)
        val_sorted = jnp.pad(val_sorted, pad, constant_values=-1)
        key_sorted = jnp.pad(key_sorted, pad, constant_values=T)
    out = jnp.where(key_sorted[..., :U] < T, val_sorted[..., :U], -1)
    lengths = jnp.minimum(jnp.sum(keep, axis=0), U).astype(jnp.int32)
    return out, lengths


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
    return _left_compact(best, keep, U)


def greedy_stream_decode(
    logits: jnp.ndarray,        # (T, B, V)
    logit_lengths: jnp.ndarray, # (B,)
    prev: jnp.ndarray,          # (B,) carry: last valid frame's raw argmax
    blank_id: int = -1,
    max_output: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chunk-carried greedy decode: ``greedy_decode`` whose repeat-collapse
    sees the previous chunk's final frame, so a character spanning a chunk
    boundary is not emitted twice.  Feeding chunks through this with the
    returned ``prev`` carry and concatenating the outputs reproduces the
    whole-clip ``greedy_decode`` text exactly.

    ``prev`` starts at -1 (matches ``greedy_decode``'s t=0 sentinel).
    Returns (labels (B, U), lengths (B,), new_prev (B,)).
    """
    T, B, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    U = max_output or T

    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)     # (T, B)
    prev_shift = jnp.concatenate([prev[None, :], best[:-1]], axis=0)
    valid = jnp.arange(T)[:, None] < logit_lengths[None, :]
    keep = valid & (best != blank_id) & (best != prev_shift)
    out, lengths = _left_compact(best, keep, U)
    # Carry out the argmax at the last VALID frame (one-hot select, no
    # gather); empty chunks pass the old carry through.
    last_oh = jnp.arange(T)[:, None] == (logit_lengths - 1)[None, :]
    last_best = jnp.sum(jnp.where(last_oh, best, 0), axis=0).astype(jnp.int32)
    new_prev = jnp.where(logit_lengths > 0, last_best, prev)
    return out, lengths, new_prev


class BeamState(NamedTuple):
    hash: jnp.ndarray      # (B, K) int32 prefix identity (primary)
    hash2: jnp.ndarray     # (B, K) int32 prefix identity (secondary)
    phash: jnp.ndarray     # (B, K) int32 parent-prefix identity (primary)
    phash2: jnp.ndarray    # (B, K) int32 parent-prefix identity (secondary)
    has_par: jnp.ndarray   # (B, K) bool: prefix is nonempty (parent exists)
    last: jnp.ndarray      # (B, K) int32 last char (blank if empty)
    p_b: jnp.ndarray       # (B, K) log P(prefix, ending in blank)
    p_nb: jnp.ndarray      # (B, K) log P(prefix, ending in non-blank)


def _select_rows(field: jnp.ndarray, sel: jnp.ndarray):
    """Gather-free row selection: ``field[b, idx[b, k]]`` where ``sel`` is
    the one-hot bool mask (B, K_out, N) of idx.  Exact for ints and floats
    (exactly one True per row; where+sum never mixes values)."""
    return jnp.sum(jnp.where(sel, field[:, None, :], 0), axis=-1)


def _beam_init(B: int, K: int, V: int, blank_id: int, lm=None):
    """Fresh (BeamState, lm carry) for a B-row, K-beam search.

    The lm carry is ``(cumulative logP (B,K), next-char logp (B,K,V),
    lm state with leaves reshaped (B,K,-1))`` or None without an LM."""
    init = BeamState(
        hash=jnp.zeros((B, K), jnp.int32),
        hash2=jnp.zeros((B, K), jnp.int32),
        phash=jnp.zeros((B, K), jnp.int32),
        phash2=jnp.zeros((B, K), jnp.int32),
        has_par=jnp.zeros((B, K), bool),
        last=jnp.full((B, K), blank_id, jnp.int32),
        p_b=jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF)
        * jnp.ones((B, 1)),
        p_nb=jnp.full((B, K), NEG_INF),
    )
    if lm is None:
        return init, None
    lm_init, _ = lm
    lm_state0, lm_logp0 = lm_init(B * K)
    lm0 = (
        jnp.zeros((B, K), jnp.float32),                    # cumulative logP
        lm_logp0.reshape(B, K, -1)[:, :, :V],
        jax.tree.map(lambda leaf: leaf.reshape(B, K, -1), lm_state0),
    )
    return init, lm0


def _beam_scan(
    log_probs: jnp.ndarray,     # (T, B, V) log-softmaxed
    logit_lengths: jnp.ndarray, # (B,)
    init: BeamState,
    lm0,
    blank_id: int,
    lm=None,
    lm_weight: float = 0.0,
):
    """Run the prefix-beam step over ``log_probs`` from carried state.

    Returns ``((final, lm_final), (parents (T,B,K), emitted (T,B,K)))`` —
    the trellis records needed to backtrack prefixes.  Shared by the
    whole-clip decoder and the chunk-carried streaming decoder; splitting a
    clip at any frame boundary and chaining the carries is exact."""
    T, B, V = log_probs.shape
    K = init.last.shape[1]
    use_lm = lm is not None and lm_weight != 0.0
    lm_advance = lm[1] if use_lm else None
    chars = jnp.arange(V, dtype=jnp.int32)
    mult1 = np.int32(_HASH_MULT)
    mult2 = np.int32(_HASH_MULT2)
    arange_k = jnp.arange(K, dtype=jnp.int32)

    def _sel_k(field, sel_p):
        """Per-beam selection by parent for (B, K, ...) fields.

        These values are RESELECTED every frame, so per-step rounding would
        random-walk into the fused scores over long utterances (DEFAULT
        matmul precision rounds operands to bf16 on TPU).  A bf16-exact
        high part plus a residual keeps the selection ~f32-exact while
        staying on the MXU; XLA is barred from re-merging the two dots."""
        sel = sel_p.astype(field.dtype)
        hi = field.astype(jnp.bfloat16).astype(field.dtype)
        lo = jax.lax.optimization_barrier(field - hi)
        return (
            jnp.einsum("bkj,bj...->bk...", sel, hi)
            + jnp.einsum("bkj,bj...->bk...", sel, lo)
        )

    def step(carry, inp):
        state, lm_c = carry
        lp_t, t = inp                                   # lp_t: (B, V)
        total = jnp.logaddexp(state.p_b, state.p_nb)    # (B, K)
        last_oh = state.last[:, :, None] == chars[None, None, :]  # (B, K, V)

        # Slot i (i < K) per beam: "stay" (emit blank, or repeat last char).
        stay_pb = total + lp_t[:, blank_id][:, None]
        lp_last = jnp.sum(jnp.where(last_oh, lp_t[:, None, :], 0.0), axis=-1)
        stay_pnb = state.p_nb + lp_last

        # Slots K..C-1: extend beam j with char c (blank column masked out).
        same_as_last = last_oh
        base = jnp.where(same_as_last, state.p_b[:, :, None], total[:, :, None])
        ext_pnb = base + lp_t[:, None, :]
        is_blank = chars[None, None, :] == blank_id
        ext_pnb = jnp.where(is_blank, NEG_INF, ext_pnb)

        # --- exact merge: stay(i) duplicates extend(j, last_i) iff
        # prefix_j == parent(prefix_i).  At most one j matches (prefixes
        # are distinct), so a masked max is an exact select.
        match = (
            (state.phash[:, :, None] == state.hash[:, None, :])
            & (state.phash2[:, :, None] == state.hash2[:, None, :])
            & state.has_par[:, :, None]
        )                                               # (B, i=K, j=K)
        # ext_pnb value at (j, last_i), reconstructed algebraically from
        # (B, K)-sized pieces instead of materializing a (B, K, K, V)
        # broadcast: extend(j, c) scores (c == last_j ? p_b_j : total_j)
        # + lp_t[c]; at c = last_i that is last_eq-selected.  last_i can be
        # blank only for empty/dead beams (init.last = blank), where the
        # original one-hot hit ext_pnb's blank column = NEG_INF — mask it.
        last_eq = state.last[:, :, None] == state.last[:, None, :]  # (B,i,j)
        ext_at_last = jnp.where(
            (state.last == blank_id)[:, :, None],
            NEG_INF,
            jnp.where(last_eq, state.p_b[:, None, :], total[:, None, :])
            + lp_last[:, :, None],
        )                                               # (B, i, j)
        contrib = jnp.max(
            jnp.where(match, ext_at_last, NEG_INF), axis=-1
        )                                               # (B, i)
        stay_pnb = jnp.logaddexp(stay_pnb, contrib)
        # Kill the merged extend candidates so they are not double-counted.
        # kill(j, c) = any_i match(i, j) & last_i == c, as a 0/1 matmul over
        # i (counts <= K are exact in any float dtype) instead of reducing
        # a (B, K, K, V) broadcast.
        kill = jnp.einsum(
            "bij,biv->bjv",
            match.astype(jnp.float32), last_oh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) > 0.5                                         # (B, j, V)
        ext_pnb = jnp.where(kill, NEG_INF, ext_pnb)

        # --- flatten + top-K --------------------------------------------
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((B, K * V), NEG_INF)], axis=1
        )
        cand_pnb = jnp.concatenate(
            [stay_pnb, ext_pnb.reshape(B, K * V)], axis=1
        )
        score = jnp.logaddexp(cand_pb, cand_pnb)        # (B, C) AM score
        if use_lm:
            lm_cum, lm_logp, lm_state = lm_c
            # Shallow-fusion rank: stay keeps the prefix LM score; extend
            # adds the LM's next-char log-prob.
            lm_rank = jnp.concatenate(
                [lm_cum, (lm_cum[:, :, None] + lm_logp).reshape(B, K * V)],
                axis=1,
            )
            rank = jnp.where(
                score <= NEG_INF / 2, NEG_INF, score + lm_weight * lm_rank
            )
        else:
            rank = score
        top_idx = _top_k_indices(rank, K)               # (B, K)

        # Candidate identity decodes arithmetically from its index.
        is_stay = top_idx < K
        parent = jnp.where(is_stay, top_idx, (top_idx - K) // V)
        char = jnp.where(is_stay, -1, (top_idx - K) % V)

        # Gather-free field selection (exact, ints and floats alike).
        sel_p = parent[:, :, None] == arange_k[None, None, :]    # (B, K, K)
        h_par = _select_rows(state.hash, sel_p)
        h2_par = _select_rows(state.hash2, sel_p)
        ph_par = _select_rows(state.phash, sel_p)
        ph2_par = _select_rows(state.phash2, sel_p)
        hp_par = _select_rows(state.has_par, sel_p) > 0
        last_par = _select_rows(state.last, sel_p)

        # Selected candidate scores, rebuilt exactly from (B, K)-sized
        # selections rather than a (B, K, C) one-hot over the flattened
        # candidate table: stay slots carry (stay_pb, merged stay_pnb) at
        # their parent; extend slots carry pb = NEG_INF and
        # pnb = (char == last_par ? p_b_par : total_par) + lp_t[char],
        # NEG_INF'd when the candidate was blank-masked or merge-killed.
        stay_pb_sel = _select_rows(stay_pb, sel_p)
        stay_pnb_sel = _select_rows(stay_pnb, sel_p)
        pb_par = _select_rows(state.p_b, sel_p)
        total_par = _select_rows(total, sel_p)
        char_sel = jnp.where(is_stay, 0, char)
        char_oh_sel = char_sel[:, :, None] == chars[None, None, :]
        lp_char = jnp.sum(jnp.where(char_oh_sel, lp_t[:, None, :], 0.0),
                          axis=-1)                                # (B, K)
        ext_val = (
            jnp.where(char_sel == last_par, pb_par, total_par) + lp_char
        )
        # killed(k) = any_i match(i, parent_k) & last_i == char_k — the
        # same merge-kill as above, evaluated only at the selected slots.
        match_par = jnp.sum(
            jnp.where(sel_p[:, :, None, :], match[:, None, :, :], False),
            axis=-1,
        ) > 0                                           # (B, K_out, i=K)
        last_eq_char = state.last[:, None, :] == char_sel[:, :, None]
        killed = jnp.any(match_par & last_eq_char, axis=-1)
        ext_pnb_sel = jnp.where(
            killed | (char_sel == blank_id), NEG_INF, ext_val
        )
        new_pb = jnp.where(is_stay, stay_pb_sel, NEG_INF)
        new_pnb = jnp.where(is_stay, stay_pnb_sel, ext_pnb_sel)

        dead = jnp.logaddexp(new_pb, new_pnb) <= NEG_INF / 2
        new = BeamState(
            hash=jnp.where(is_stay, h_par, h_par * mult1 ^ (char + 1)),
            hash2=jnp.where(is_stay, h2_par, h2_par * mult2 + (char + 1)),
            phash=jnp.where(is_stay, ph_par, h_par),
            phash2=jnp.where(is_stay, ph2_par, h2_par),
            has_par=jnp.where(is_stay, hp_par, True),
            last=jnp.where(is_stay, last_par, char),
            p_b=jnp.where(dead, NEG_INF, new_pb),
            p_nb=jnp.where(dead, NEG_INF, new_pnb),
        )

        # Freeze finished examples.
        live = (t < logit_lengths)[:, None]
        merged = BeamState(*[
            jnp.where(live, n, s) for n, s in zip(new, state)
        ])
        parent = jnp.where(live, parent, arange_k[None, :])
        char = jnp.where(live, char, -1)

        lm_out = lm_c
        if use_lm:
            # Reselect the LM view by parent, then advance only the beams
            # that appended a character.  The cumulative score is CARRIED
            # (reselected every frame), so it takes the exact where+sum
            # selection — _sel_k's split-einsum still rounds the residual
            # and the error would random-walk over long utterances.  The
            # per-frame logp table is recomputed fresh each step, so its
            # selection error cannot compound.
            cum_par = _select_rows(lm_cum, sel_p)
            logp_par = _sel_k(lm_logp, sel_p)            # (B, K, V)
            char_oh = jnp.where(is_stay, 0, char)[:, :, None] == chars[None, None, :]
            logp_char = jnp.sum(jnp.where(char_oh, logp_par, 0.0), axis=-1)
            new_cum = jnp.where(is_stay, cum_par, cum_par + logp_char)

            state_par = jax.tree.map(
                lambda leaf: _sel_k(leaf.reshape(B, K, -1), sel_p), lm_state
            )
            adv_state, adv_logp = lm_advance(
                jax.tree.map(lambda leaf: leaf.reshape(B * K, -1), state_par),
                jnp.where(is_stay, 0, char).reshape(B * K),
            )
            keep_stay = is_stay[:, :, None]
            new_logp = jnp.where(
                keep_stay, logp_par, adv_logp.reshape(B, K, -1)[:, :, :V]
            )
            new_state = jax.tree.map(
                lambda old, adv: jnp.where(
                    keep_stay, old, adv.reshape(B, K, -1)
                ),
                state_par, adv_state,
            )
            # Freeze finished examples' LM view too.
            live3 = live[:, :, None]
            lm_out = (
                jnp.where(live, new_cum, lm_cum),
                jnp.where(live3, new_logp, lm_logp),
                jax.tree.map(
                    lambda n, o: jnp.where(live3, n, o.reshape(B, K, -1)),
                    new_state, lm_state,
                ),
            )
        return (merged, lm_out), (parent, char)

    return jax.lax.scan(step, (init, lm0), (log_probs, jnp.arange(T)))


def _backtrack(parents, emitted, order):
    """Trace beam lineages back through a (T, B, K) trellis.

    ``order`` (B, K) picks which final beams to follow.  Returns
    ``(ancestors (B, K), chars_fwd (T, B, K))``: the start-of-trellis beam
    index each followed beam descends from, and its emitted chars (-1 for
    stay steps) in forward time order."""
    K = order.shape[1]
    arange_k = jnp.arange(K, dtype=jnp.int32)

    def back(carry, inp):
        beam_idx = carry                                 # (B, K)
        parent_t, char_t = inp
        sel = beam_idx[:, :, None] == arange_k[None, None, :]
        ch = _select_rows(char_t, sel)
        nxt = _select_rows(parent_t, sel)
        return nxt, ch

    ancestors, chars_rev = jax.lax.scan(
        back, order, (parents, emitted), reverse=True
    )                                                    # (T, B, K) fwd order
    return ancestors, chars_rev


def beam_search_decode(
    logits: jnp.ndarray,        # (T, B, V)
    logit_lengths: jnp.ndarray, # (B,)
    beam_width: int = 16,
    blank_id: int = -1,
    max_output: int = 0,
    lm=None,                    # optional (init, advance) from language.stepper
    lm_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prefix beam search. Returns (labels (B, K, U), lengths (B, K),
    scores (B, K)) sorted best-first; labels padded with -1.

    With ``lm`` set (see rnn_speech_tpu.models.language.stepper) and
    ``lm_weight`` > 0, candidates are ranked by shallow fusion:
    AM log-prob + lm_weight * LM log-prob of the emitted characters.  The
    LM state advances once per appended character per beam, with the same
    gather-free selection discipline as the rest of the step.  This is the
    AM+LM "general SpeechRecognizer" combination the reference planned but
    never built (/root/reference/README.md roadmap item 3,
    /root/reference/models/SpeechRecognizer.py:4-8).
    """
    T, B, V = logits.shape
    K = beam_width
    if blank_id < 0:
        blank_id = V + blank_id
    U = max_output or T
    use_lm = lm is not None and lm_weight != 0.0
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    arange_k = jnp.arange(K, dtype=jnp.int32)

    init, lm0 = _beam_init(B, K, V, blank_id, lm if use_lm else None)
    (final, lm_final), (parents, emitted) = _beam_scan(
        log_probs, logit_lengths, init, lm0, blank_id, lm, lm_weight
    )

    # --- backtrack ------------------------------------------------------
    scores = jnp.logaddexp(final.p_b, final.p_nb)       # (B, K) AM
    if use_lm:
        scores = scores + lm_weight * lm_final[0]       # fused score
    order = jnp.argsort(-scores, axis=-1)
    order_oh = order[:, :, None] == arange_k[None, None, :]
    scores = _select_rows(scores, order_oh)

    _, chars_fwd = _backtrack(parents, emitted, order)

    # Left-compact emitted (!= -1) chars into (B, K, U).
    keep = chars_fwd >= 0                                # (T, B, K)
    out, lengths = _left_compact(chars_fwd, keep, U)
    return out, lengths, scores


class BeamStream(NamedTuple):
    """Carried state for chunk-at-a-time beam decoding (the ``--record``
    decode path).  ``prefix``/``prefix_len`` hold each live beam's
    NOT-yet-committed label suffix: committed symbols — those shared by
    every live beam, which no future evidence can revise — are returned by
    ``beam_stream_decode`` and trimmed off the buffer, so the buffer only
    needs to cover beam disagreement, not the whole utterance.

    The reference's ``--record`` carried only the RNN state and re-ran an
    independent decode per chunk (/root/reference/stt.py:348-357); carrying
    the beam (and LM-fusion) state too makes chunked decoding exactly equal
    to whole-clip decoding."""

    beam: BeamState
    lm: object               # (cum, logp, state) from _beam_init, or None
    prefix: jnp.ndarray      # (B, K, U) int32, -1 padded
    prefix_len: jnp.ndarray  # (B, K) int32


def beam_stream_init(
    n_batch: int,
    num_labels: int,
    beam_width: int = 16,
    max_suffix: int = 64,
    blank_id: int = -1,
    lm=None,
) -> BeamStream:
    """Fresh streaming-beam state.  ``max_suffix`` bounds the uncommitted
    label buffer (committed symbols are trimmed each chunk, so it only
    needs to hold the divergence between beams plus one chunk's output)."""
    if blank_id < 0:
        blank_id = num_labels + blank_id
    beam, lm0 = _beam_init(n_batch, beam_width, num_labels, blank_id, lm)
    return BeamStream(
        beam=beam,
        lm=lm0,
        prefix=jnp.full((n_batch, beam_width, max_suffix), -1, jnp.int32),
        prefix_len=jnp.zeros((n_batch, beam_width), jnp.int32),
    )


def beam_stream_decode(
    stream: BeamStream,
    logits: jnp.ndarray,        # (T, B, V) this chunk's frames
    logit_lengths: jnp.ndarray, # (B,) valid frames this chunk
    blank_id: int = -1,
    lm=None,
    lm_weight: float = 0.0,
) -> Tuple[BeamStream, jnp.ndarray, jnp.ndarray]:
    """Advance the beam search by one chunk of frames.

    Returns ``(stream', committed (B, U+T), committed_len (B,))`` where
    ``committed`` are the newly-finalized symbols: the longest common
    prefix of every live beam, which the search can no longer revise
    (every future beam descends from a current live beam).  Feeding a clip
    chunk-by-chunk and concatenating the committed symbols plus the final
    ``beam_stream_flush`` tail reproduces whole-clip
    ``beam_search_decode``'s top-1 text exactly, at every chunk size,
    PROVIDED beam disagreement never outgrows ``max_suffix``.  If it does,
    the overflow is force-committed from the best beam (bounded-latency
    semantics: lower-ranked beams lose their alternative spelling of those
    symbols, but nothing is ever silently dropped — every emitted symbol
    appears exactly once across the committed chunks plus the flush tail).
    """
    T, B, V = logits.shape
    K = stream.beam.last.shape[1]
    U = stream.prefix.shape[2]
    # Work at width U+T so appending this chunk's emissions (at most T of
    # them) can never clamp; the carried buffer is re-bounded to U below
    # via the forced commit.
    Uw = U + T
    if blank_id < 0:
        blank_id = V + blank_id
    use_lm = lm is not None and lm_weight != 0.0
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    arange_k = jnp.arange(K, dtype=jnp.int32)
    arange_u = jnp.arange(Uw, dtype=jnp.int32)

    (final, lm_final), (parents, emitted) = _beam_scan(
        log_probs, logit_lengths, stream.beam, stream.lm, blank_id,
        lm, lm_weight,
    )

    # Per-step top-k already orders beams by the fused score, so beam 0 of
    # the carried state is the current best hypothesis — no re-sort.
    order = jnp.broadcast_to(arange_k[None, :], (B, K))
    ancestors, chars_fwd = _backtrack(parents, emitted, order)
    chunk_out, chunk_len = _left_compact(chars_fwd, chars_fwd >= 0, T)

    # New suffix per beam = ancestor's carried suffix ++ this chunk's
    # emissions.  One-hot row-select is exact; the append is index
    # arithmetic over the static U axis (gathers are fine outside the
    # scan — this runs once per chunk).
    sel = ancestors[:, :, None] == arange_k[None, None, :]       # (B, K, K)
    prefix_w = jnp.pad(
        stream.prefix, ((0, 0), (0, 0), (0, T)), constant_values=-1
    )                                                            # (B, K, Uw)
    par_prefix = jnp.sum(
        jnp.where(sel[:, :, :, None], prefix_w[:, None, :, :], 0),
        axis=2,
    )
    par_len = jnp.sum(jnp.where(sel, stream.prefix_len[:, None, :], 0),
                      axis=-1)
    idx = arange_u[None, None, :] - par_len[:, :, None]          # (B, K, Uw)
    from_chunk = jnp.take_along_axis(
        chunk_out, jnp.clip(idx, 0, chunk_out.shape[2] - 1), axis=-1
    )
    new_prefix = jnp.where(
        idx < 0,
        par_prefix,
        jnp.where(idx < chunk_len[:, :, None], from_chunk, -1),
    )
    new_len = par_len + chunk_len          # <= Uw by construction

    # Committed = longest common prefix over LIVE beams (dead beams are
    # NEG_INF filler and must not constrain it).
    live = jnp.logaddexp(final.p_b, final.p_nb) > NEG_INF / 2    # (B, K)
    ref = new_prefix[:, 0:1, :]                                  # beam 0
    within = arange_u[None, None, :] < new_len[:, :, None]
    agrees = (new_prefix == ref) & within
    ok = jnp.all(agrees | ~live[:, :, None], axis=1)             # (B, Uw)
    commit_len = jnp.sum(
        jnp.cumprod(ok.astype(jnp.int32), axis=-1), axis=-1
    ).astype(jnp.int32)

    # Bounded-latency forced commit: the carried buffer holds only U
    # symbols, so if the longest live suffix left after the natural
    # (all-beams-agree) commit still exceeds U, commit the best beam's
    # oldest overflow symbols too.  Disagreeing beams lose their
    # alternative spelling of those positions; the only other option is
    # dropping symbols silently.
    live_len = jnp.where(live, new_len, 0)
    force = jnp.maximum(jnp.max(live_len, axis=1) - commit_len - U, 0)
    commit_len = commit_len + force

    committed = jnp.where(
        arange_u[None, :] < commit_len[:, None], new_prefix[:, 0, :], -1
    )

    # Trim the committed head off every beam's suffix buffer and re-bound
    # it to U (lossless for live beams: forced commit guarantees their
    # trimmed length fits).
    tidx = jnp.broadcast_to(
        arange_u[None, None, :] + commit_len[:, None, None],
        new_prefix.shape,
    )
    trimmed = jnp.take_along_axis(
        new_prefix, jnp.minimum(tidx, Uw - 1), axis=-1
    )
    trim_len = jnp.clip(new_len - commit_len[:, None], 0, U)
    trimmed = jnp.where(
        arange_u[None, None, :] < trim_len[:, :, None], trimmed, -1
    )[:, :, :U]

    out = BeamStream(
        beam=final, lm=lm_final, prefix=trimmed, prefix_len=trim_len
    )
    return out, committed, commit_len


def beam_stream_flush(
    stream: BeamStream,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """End-of-stream tail: the best beam's remaining uncommitted suffix
    (already left-aligned and -1 padded).  Returns (labels (B, U),
    lengths (B,))."""
    return stream.prefix[:, 0, :], stream.prefix_len[:, 0]
