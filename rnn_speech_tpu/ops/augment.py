"""SpecAugment: on-device time/frequency masking (Park et al., arXiv:1904.08779).

Beyond the reference (which had no augmentation): masking runs INSIDE the
compiled train step on the already-on-device features, so augmentation costs
no host CPU and no extra transfers — a few fused `where` ops on the VPU.

Masks follow the paper's policy, adapted to this frontend:
  * frequency masks zero a random band of mel channels; for fbank-120 the
    same band is zeroed across the static/Δ/ΔΔ groups (the three views of
    one mel channel), matching masking the raw log-mel before deltas.
  * time masks zero a random span of frames, with width drawn relative to
    each utterance's true length (the paper's adaptive pS policy).

Everything is shape-static: masks are built from `arange` comparisons, so
jit sees no dynamic shapes.  Eval paths never call this.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def spec_augment(
    feats: jnp.ndarray,           # (T, B, D) time-major features
    frame_lengths: jnp.ndarray,   # (B,) true frame counts
    rng: jax.Array,
    *,
    n_freq_masks: int = 2,
    freq_mask_width: int = 8,     # max mel channels per mask (of D//groups)
    n_time_masks: int = 2,
    time_mask_ratio: float = 0.05,  # max span per mask, fraction of length
    groups: int = 1,              # feature groups sharing one channel axis
) -> jnp.ndarray:
    """Returns feats with random time/frequency bands zeroed per example."""
    T, B, D = feats.shape
    channels = D // groups
    k_fs, k_fw, k_ts, k_tw = jax.random.split(rng, 4)

    # Frequency masks: width f in [0, maxw], then start in [0, C - f] — the
    # paper's policy, so every mask keeps its full width (no edge
    # truncation biasing the top mel bands).
    f_width = jax.random.randint(k_fw, (B, n_freq_masks), 0,
                                 min(freq_mask_width, channels) + 1)
    u_fs = jax.random.uniform(k_fs, (B, n_freq_masks))
    f_start = (u_fs * (channels - f_width + 1).astype(jnp.float32)).astype(
        jnp.int32
    )
    ch_idx = jnp.arange(channels)[None, :, None]           # (1, C, 1)
    f_masked = jnp.any(
        (ch_idx >= f_start[:, None, :]) & (ch_idx < (f_start + f_width)[:, None, :]),
        axis=-1,
    )                                                      # (B, C) bool
    # Replicate the channel mask across groups -> (B, D).
    f_masked = jnp.tile(f_masked, (1, groups))

    # Time masks: widths relative to each example's true length.
    max_w = jnp.maximum(
        (frame_lengths.astype(jnp.float32) * time_mask_ratio).astype(jnp.int32),
        1,
    )                                                      # (B,)
    u_w = jax.random.uniform(k_tw, (B, n_time_masks))
    # Inclusive upper bound (width can reach max_w), matching the
    # frequency path's randint(0, w + 1).
    t_width = (u_w * (max_w[:, None] + 1).astype(jnp.float32)).astype(jnp.int32)
    u_s = jax.random.uniform(k_ts, (B, n_time_masks))
    # start in [0, length - width] inclusive, so the final frame is
    # coverable.
    span = jnp.maximum(frame_lengths[:, None] - t_width + 1, 1)
    t_start = (u_s * span.astype(jnp.float32)).astype(jnp.int32)
    t_idx = jnp.arange(T)[None, :, None]                   # (1, T, 1)
    t_masked = jnp.any(
        (t_idx >= t_start[:, None, :]) & (t_idx < (t_start + t_width)[:, None, :]),
        axis=-1,
    )                                                      # (B, T) bool

    keep = ~(f_masked[None, :, :] | t_masked.T[:, :, None])  # (T, B, D)
    return jnp.where(keep, feats, 0.0)


def groups_for_feature_dim(feature_dim: int) -> int:
    """Channel groups for a feature layout: the fbank static/Δ/ΔΔ triple
    shares one mel-channel axis; anything else masks as one flat group."""
    from rnn_speech_tpu.frontend import FBANK_DIM

    return 3 if feature_dim == FBANK_DIM else 1
