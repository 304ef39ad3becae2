"""Fused Pallas TPU kernel for the LSTM recurrence.

Replaces the reference's cuDNN-backed ``dynamic_rnn`` time loop
(/root/reference/models/AcousticModel.py:276-278) with a single
``pallas_call`` whose grid walks the time axis: the cell state (h, c) lives
in VMEM scratch across grid steps, the recurrent weights stay resident in
VMEM for the whole sequence, and each step's input contribution
(precomputed as one large MXU matmul outside the kernel) is streamed in as
a (1, B, 4H) block.  This removes per-step HBM round-trips for h/c/W_h —
the scan-based path re-reads W_h from HBM every step unless XLA happens to
keep it cached.

Forward-only: the training path uses the autodiff-able ``lax.scan``
recurrence (rnn_speech_tpu.ops.lstm); this kernel serves eval, decoding and
streaming.  Gate dynamics are identical (order (i, g, f, o), forget bias
+1.0, dynamic_rnn length masking) and are pinned against the scan path by
tests/test_lstm.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recurrence_kernel(mask_ref, xproj_ref, wh_ref, h0_ref, c0_ref,
                       out_ref, hn_ref, cn_ref, h_s, c_s):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    h = h_s[:]
    c = c_s[:]
    H = h.shape[-1]

    gates = xproj_ref[0] + jnp.dot(
        h.astype(wh_ref.dtype), wh_ref[:], preferred_element_type=jnp.float32
    )
    i = gates[:, :H]
    g = gates[:, H : 2 * H]
    f = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H :]
    c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

    m = mask_ref[0, 0][:, None]  # (B, 1) float {0, 1}
    c_s[:] = m * c_new + (1.0 - m) * c
    h_s[:] = m * h_new + (1.0 - m) * h
    out_ref[0] = m * h_new

    @pl.when(t == T - 1)
    def _():
        hn_ref[:] = h_s[:]
        cn_ref[:] = c_s[:]


def lstm_recurrence_pallas(
    x_proj: jnp.ndarray,        # (T, B, 4H) float32, bias already added
    w_h: jnp.ndarray,           # (H, 4H) in compute dtype
    mask: jnp.ndarray,          # (T, 1, B) float32 validity mask (the unit
                                # middle axis satisfies TPU block tiling)
    h0: jnp.ndarray,            # (B, H) float32
    c0: jnp.ndarray,            # (B, H) float32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    T, B, four_h = x_proj.shape
    H = four_h // 4

    out, hn, cn = pl.pallas_call(
        _recurrence_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, four_h), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h,
            bytes_accessed=T * B * four_h * 4 + H * four_h * w_h.dtype.itemsize,
            transcendentals=4 * T * B * H,
        ),
    )(mask, x_proj, w_h, h0, c0)
    return out, hn, cn


def lstm_layer_pallas(
    params,
    x: jnp.ndarray,             # (T, B, D)
    seq_lengths: jnp.ndarray,   # (B,)
    state,                      # (c, h)
    compute_dtype=jnp.float32,
):
    """Drop-in replacement for lstm.lstm_layer_scan on TPU (forward only)."""
    T, B, _ = x.shape
    cd = compute_dtype
    x_proj = (
        jnp.dot(x.astype(cd), params["w_x"].astype(cd), preferred_element_type=jnp.float32)
        + params["b"].astype(jnp.float32)
    )
    mask = (jnp.arange(T)[:, None] < seq_lengths[None, :]).astype(
        jnp.float32
    )[:, None, :]
    c0, h0 = state
    out, hn, cn = lstm_recurrence_pallas(
        x_proj, params["w_h"].astype(cd), mask,
        h0.astype(jnp.float32), c0.astype(jnp.float32),
    )
    return out, (cn, hn)
