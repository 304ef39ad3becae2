"""Batched Levenshtein distance on device.

Replaces ``tf.edit_distance`` as used for the train-time error rate at
/root/reference/models/AcousticModel.py:370 (normalized by true-label
length, averaged over the batch).

The DP runs as a ``lax.scan`` over reference positions with the whole
(B, M+1) row vectorized; the within-row left-to-right dependency
(deletion chain) is resolved with the prefix-min trick:

    d[i][j] = min_k<=j ( t[k] + (j - k) )   where t is the row after the
    substitution/insertion candidates — i.e. j + cummin(t[k] - k), one
    associative scan per row instead of a sequential inner loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 20)


def edit_distance(
    a: jnp.ndarray,          # (B, N) int32, padded with anything
    a_lengths: jnp.ndarray,  # (B,)
    b: jnp.ndarray,          # (B, M) int32
    b_lengths: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    """Per-example Levenshtein distance between a[:len] and b[:len], (B,)."""
    B, N = a.shape
    M = b.shape[1]

    j_idx = jnp.arange(M + 1)[None, :]                       # (1, M+1)
    # Row 0: distance from empty prefix of a is j; cells past b's true
    # length are poisoned so they never win a min.
    row0 = jnp.where(j_idx <= b_lengths[:, None], j_idx, BIG).astype(jnp.int32)

    b_mask = (jnp.arange(M)[None, :] < b_lengths[:, None])   # (B, M)

    def step(prev_row, inp):
        a_i, i = inp                                          # a_i: (B,)
        sub_cost = jnp.where(a_i[:, None] == b, 0, 1)         # (B, M)
        sub_cost = jnp.where(b_mask, sub_cost, BIG)
        # Candidates without the deletion chain:
        #   diag:  prev_row[j-1] + sub_cost
        #   up:    prev_row[j]   + 1
        diag = prev_row[:, :-1] + sub_cost
        up = prev_row + 1
        t = up.at[:, 1:].min(diag)
        # First column: i+1 edits when row is active.
        t = t.at[:, 0].set(i + 1)
        # Deletion chain via prefix-min: d[j] = j + cummin(t[k] - k).
        shifted = t - j_idx
        cm = jax.lax.associative_scan(jnp.minimum, shifted, axis=-1)
        row = (cm + j_idx).astype(jnp.int32)
        # Rows past a's true length keep the previous row (freeze).
        active = (i < a_lengths)[:, None]
        return jnp.where(active, row, prev_row), None

    final_row, _ = jax.lax.scan(
        step, row0, (a.T.astype(jnp.int32), jnp.arange(N))
    )
    # Pick final_row[b, b_lengths[b]] without a lane-axis gather (slow on
    # TPU): one-hot mask + sum, exact in int32.
    pick = jnp.minimum(b_lengths, M)[:, None] == jnp.arange(M + 1)[None, :]
    return jnp.sum(jnp.where(pick, final_row, 0), axis=1)


def error_rate(
    pred: jnp.ndarray, pred_lengths: jnp.ndarray,
    truth: jnp.ndarray, truth_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Mean over batch of edit_distance / truth_length (tf.edit_distance
    normalize=True semantics; empty truths count distance/0 -> masked)."""
    dist = edit_distance(pred, pred_lengths, truth, truth_lengths).astype(jnp.float32)
    denom = truth_lengths.astype(jnp.float32)
    rate = jnp.where(denom > 0, dist / jnp.maximum(denom, 1.0),
                     jnp.where(pred_lengths > 0, jnp.inf, 0.0))
    # tf.edit_distance yields inf for empty truth with nonempty hypothesis;
    # the batch mean here masks those to keep training metrics finite.
    # Empty-truth rows are batch padding (the corpus filters labels <= 3
    # chars), so they are excluded from the mean rather than counted as
    # perfect matches.
    counted = jnp.isfinite(rate) & (truth_lengths > 0)
    return jnp.sum(jnp.where(counted, rate, 0.0)) / jnp.maximum(
        jnp.sum(counted), 1
    )
