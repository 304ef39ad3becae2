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

Differentiable: ``lstm_layer_pallas`` carries a custom VJP so the same
fused recurrence serves training.  The forward-for-grad kernel additionally
streams out the activated gates and the carried cell sequence (the cuDNN
residual strategy); the backward kernel walks the grid in *reverse* time
with the dh/dc carries living in VMEM scratch and W_h resident, emitting
per-step pre-activation gate gradients.  The weight/bias gradients
    dW_h = h_prev^T · dgates,  dW_x = x^T · dgates,  db = Σ dgates
then reduce in ONE fused Pallas pass over the dgates stream
(ops/grad_matmul_pallas.py — a separate kernel, so no (H, 4H) accumulator
ever competes for VMEM with the recurrence weights), and dx = dgates ·
W_x^T stays a large M-major MXU matmul XLA handles well.

Residual precision is selectable (``residual_dtype``): when the layer
computes in bfloat16 the streamed residuals — activated gates, cell
sequence, and the emitted dgates — default to bfloat16 too, halving both
the residual HBM footprint (the binding constraint on fused batch width at
T=3510: f32 residuals for a 3x1024 stack at B=64 exceed a v5e's 16 GB) and
the backward kernel's HBM traffic.  All arithmetic inside both kernels
stays f32 (values are upcast on read); only storage narrows.  Gate
activations and tanh(c) are squashed into [-1, 1] where bf16 carries ~3
decimal digits, and the dW/dx reductions accumulate in f32 via the MXU, so
the gradient noise this adds is far below dropout/CTC sampling noise —
pinned against the f32-residual path by tests/test_lstm.py.

Gate dynamics are identical to the scan path (order (i, g, f, o), forget
bias +1.0, dynamic_rnn length masking) and both values and gradients are
pinned against it by tests/test_lstm.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_speech_tpu.ops import pallas_vma

# Scoped-VMEM ceiling for the recurrence kernels.  The compiler's 16 MiB
# default is sized for small fused loops; at B=128 the double-buffered
# per-step blocks plus the resident (H, 4H) weight matrix need ~18 MiB.
# The hardware carries 128 MiB — 64 MiB leaves pipelining headroom while
# bounding what one kernel may pin.
_VMEM_LIMIT = 64 << 20


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

    out, hn, cn = pallas_vma.pallas_call(
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h,
            bytes_accessed=T * B * four_h * 4 + H * four_h * w_h.dtype.itemsize,
            transcendentals=4 * T * B * H,
        ),
    )(mask, x_proj, w_h, h0, c0)
    return out, hn, cn


def _recurrence_train_kernel(mask_ref, xproj_ref, wh_ref, h0_ref, c0_ref,
                             out_ref, hn_ref, cn_ref, gates_ref, cseq_ref,
                             h_s, c_s):
    """Forward recurrence that also streams residuals for the backward pass:
    activated gates (i, g, f, o) and the carried cell state per step."""
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
    i_a = jax.nn.sigmoid(gates[:, :H])
    g_a = jnp.tanh(gates[:, H : 2 * H])
    f_a = jax.nn.sigmoid(gates[:, 2 * H : 3 * H] + 1.0)
    o_a = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f_a * c + i_a * g_a
    h_new = o_a * jnp.tanh(c_new)

    m = mask_ref[0, 0][:, None]  # (B, 1) float {0, 1}
    c_carried = m * c_new + (1.0 - m) * c
    c_s[:] = c_carried
    h_s[:] = m * h_new + (1.0 - m) * h
    out_ref[0] = m * h_new
    gates_ref[0] = jnp.concatenate([i_a, g_a, f_a, o_a], axis=-1).astype(
        gates_ref.dtype
    )
    cseq_ref[0] = c_carried.astype(cseq_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hn_ref[:] = h_s[:]
        cn_ref[:] = c_s[:]


def _lstm_recurrence_train(x_proj, w_h, mask, h0, c0, res_dtype):
    """Forward with residuals. Returns (out, hn, cn, gates_act, c_seq);
    the residual streams are stored in ``res_dtype``."""
    T, B, four_h = x_proj.shape
    H = four_h // 4
    return pallas_vma.pallas_call(
        _recurrence_train_kernel,
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
            pl.BlockSpec((1, B, four_h), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, four_h), res_dtype),
            jax.ShapeDtypeStruct((T, B, H), res_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h,
            bytes_accessed=T * B * four_h * 8 + T * B * H * 8
            + H * four_h * w_h.dtype.itemsize,
            transcendentals=4 * T * B * H,
        ),
    )(mask, x_proj, w_h, h0, c0)


def _recurrence_bwd_kernel(dout_ref, gates_ref, cseq_ref, cprev_ref,
                           mask_ref, wh_ref, dhn_ref, dcn_ref,
                           dgates_ref, dh0_ref, dc0_ref, dh_s, dc_s):
    """Reverse-time step: consume residuals, emit pre-activation dgates.

    Grid step i visits t = T-1-i (the index maps reverse the time axis), so
    the dh/dc carries in scratch flow backward with W_h resident in VMEM.
    """
    i = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_s[:] = dhn_ref[:]
        dc_s[:] = dcn_ref[:]

    gates = gates_ref[0].astype(jnp.float32)   # arithmetic stays f32
    H = dh_s.shape[-1]
    i_a = gates[:, :H]
    g_a = gates[:, H : 2 * H]
    f_a = gates[:, 2 * H : 3 * H]
    o_a = gates[:, 3 * H :]

    m = mask_ref[0, 0][:, None]          # (B, 1) float {0, 1}
    dh_carry = dh_s[:]
    dc_carry = dc_s[:]

    # = tanh(c_new) wherever m == 1
    tanh_c = jnp.tanh(cseq_ref[0].astype(jnp.float32))
    dh_new = m * (dout_ref[0] + dh_carry)
    do_pre = dh_new * tanh_c * o_a * (1.0 - o_a)
    dc_new = dh_new * o_a * (1.0 - tanh_c * tanh_c) + m * dc_carry
    di_pre = dc_new * g_a * i_a * (1.0 - i_a)
    dg_pre = dc_new * i_a * (1.0 - g_a * g_a)
    df_pre = dc_new * cprev_ref[0].astype(jnp.float32) * f_a * (1.0 - f_a)

    dgates = jnp.concatenate([di_pre, dg_pre, df_pre, do_pre], axis=-1)
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)

    # Grad into h_{t-1}: passthrough where masked + the recurrent matmul.
    dh_prev = jax.lax.dot_general(
        dgates.astype(wh_ref.dtype), wh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_s[:] = (1.0 - m) * dh_carry + dh_prev
    dc_s[:] = (1.0 - m) * dc_carry + dc_new * f_a

    @pl.when(i == T - 1)
    def _():
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _lstm_recurrence_bwd(dout, gates_act, c_seq, c_prev_seq, mask, w_h,
                         dhn, dcn):
    """Returns (dgates (T, B, 4H) pre-activation, dh0, dc0).  dgates is
    emitted in the residual dtype (its consumers — the dW/dx matmuls —
    cast to the compute dtype anyway and accumulate in f32)."""
    T, B, four_h = gates_act.shape
    H = four_h // 4
    res_dtype = gates_act.dtype
    rev = lambda t: (T - 1 - t, 0, 0)
    return pallas_vma.pallas_call(
        _recurrence_bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, four_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, four_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, four_h), res_dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        # dgates writes back into the activated-gates residual (same
        # shape/dtype/index map, read-before-write within each step, last
        # use of gates_act); XLA copies defensively if the operand has
        # later uses, so this only ever saves the (T, B, 4H) allocation.
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h,
            bytes_accessed=T * B * (
                four_h * (4 + 2 * res_dtype.itemsize) + H * 12
            ),
            transcendentals=T * B * H,
        ),
    )(dout, gates_act, c_seq, c_prev_seq, mask, w_h, dhn, dcn)


# ----------------------------------------- recompute-mode training kernels

def _recurrence_train_lean_kernel(mask_ref, xproj_ref, wh_ref, h0_ref,
                                  c0_ref, out_ref, hn_ref, cn_ref, cseq_ref,
                                  h_s, c_s):
    """Forward recurrence streaming only the carried cell sequence — the
    activated gates are recomputed inside the backward kernel instead of
    stored (the memory-lean residual strategy: ~H instead of ~5H bytes per
    step and layer, fitting whole-sequence batches the gates residuals
    cannot — B=96 at T=3510 on a v5e, where B=128 exceeds HBM in every
    mode; see models/acoustic.py:training_memory_plan)."""
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    h = h_s[:]
    c = c_s[:]
    H = h.shape[-1]

    gates = xproj_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(wh_ref.dtype), wh_ref[:], preferred_element_type=jnp.float32
    )
    i_a = jax.nn.sigmoid(gates[:, :H])
    g_a = jnp.tanh(gates[:, H : 2 * H])
    f_a = jax.nn.sigmoid(gates[:, 2 * H : 3 * H] + 1.0)
    o_a = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f_a * c + i_a * g_a
    h_new = o_a * jnp.tanh(c_new)

    m = mask_ref[0, 0][:, None]
    c_carried = m * c_new + (1.0 - m) * c
    c_s[:] = c_carried
    h_s[:] = m * h_new + (1.0 - m) * h
    out_ref[0] = m * h_new
    cseq_ref[0] = c_carried.astype(cseq_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hn_ref[:] = h_s[:]
        cn_ref[:] = c_s[:]


def _lstm_recurrence_train_lean(x_proj, w_h, mask, h0, c0, res_dtype):
    """Forward with lean residuals. Returns (out, hn, cn, c_seq)."""
    T, B, four_h = x_proj.shape
    H = four_h // 4
    return pallas_vma.pallas_call(
        _recurrence_train_lean_kernel,
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
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), res_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h,
            bytes_accessed=T * B * (four_h * x_proj.dtype.itemsize + H * 4
                                    + H * jnp.dtype(res_dtype).itemsize)
            + H * four_h * w_h.dtype.itemsize,
            transcendentals=4 * T * B * H,
        ),
    )(mask, x_proj, w_h, h0, c0)


def _recurrence_bwd_recompute_kernel(dout_ref, x_ref, hprev_ref, cseq_ref,
                                     cprev_ref, mask_ref, wx_ref, b_ref,
                                     wh_ref, dhn_ref, dcn_ref,
                                     dgates_ref, dh0_ref, dc0_ref,
                                     dh_s, dc_s):
    """Reverse-time step that RECOMPUTES the gate activations — both
    weight matrices stay VMEM-resident, so the recompute costs two
    (B,H)x(H,4H) matmuls per step and zero extra HBM traffic beyond the
    x/h_prev/c streams (all in the residual dtype)."""
    i = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_s[:] = dhn_ref[:]
        dc_s[:] = dcn_ref[:]

    H = dh_s.shape[-1]
    h_prev = hprev_ref[0]
    gates = (
        jnp.dot(x_ref[0], wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    i_a = jax.nn.sigmoid(gates[:, :H])
    g_a = jnp.tanh(gates[:, H : 2 * H])
    f_a = jax.nn.sigmoid(gates[:, 2 * H : 3 * H] + 1.0)
    o_a = jax.nn.sigmoid(gates[:, 3 * H :])

    m = mask_ref[0, 0][:, None]
    dh_carry = dh_s[:]
    dc_carry = dc_s[:]

    tanh_c = jnp.tanh(cseq_ref[0].astype(jnp.float32))
    dh_new = m * (dout_ref[0] + dh_carry)
    do_pre = dh_new * tanh_c * o_a * (1.0 - o_a)
    dc_new = dh_new * o_a * (1.0 - tanh_c * tanh_c) + m * dc_carry
    di_pre = dc_new * g_a * i_a * (1.0 - i_a)
    dg_pre = dc_new * i_a * (1.0 - g_a * g_a)
    df_pre = dc_new * cprev_ref[0].astype(jnp.float32) * f_a * (1.0 - f_a)

    dgates = jnp.concatenate([di_pre, dg_pre, df_pre, do_pre], axis=-1)
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)

    dh_prev = jax.lax.dot_general(
        dgates.astype(wh_ref.dtype), wh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_s[:] = (1.0 - m) * dh_carry + dh_prev
    dc_s[:] = (1.0 - m) * dc_carry + dc_new * f_a

    @pl.when(i == T - 1)
    def _():
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _lstm_recurrence_bwd_recompute(dout, x_rd, hprev_seq, c_seq, c_prev_seq,
                                   mask, w_x, b, w_h, dhn, dcn):
    """Returns (dgates (T, B, 4H) pre-activation in the residual dtype,
    dh0, dc0)."""
    T, B, four_h = dout.shape[0], dout.shape[1], w_h.shape[1]
    H = four_h // 4
    D = w_x.shape[0]
    res_dtype = x_rd.dtype
    rev = lambda t: (T - 1 - t, 0, 0)
    return pallas_vma.pallas_call(
        _recurrence_bwd_recompute_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, four_h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, four_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, four_h), res_dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * H * four_h,
            bytes_accessed=T * B * H * (4 + 4 * res_dtype.itemsize)
            + T * B * four_h * res_dtype.itemsize
            + 2 * H * four_h * w_h.dtype.itemsize,
            transcendentals=5 * T * B * H,
        ),
    )(dout, x_rd, hprev_seq, c_seq, c_prev_seq, mask, w_x, b, w_h, dhn, dcn)


# ------------------------------------------------------------- custom VJP

def _weight_grads(h_prev_seq, x, dgates, cd):
    """(dw_h, dw_x, db) from the emitted dgates: one fused Pallas pass by
    default (streams dgates once, VMEM-resident f32 accumulators — see
    ops/grad_matmul_pallas.py), with the three-einsum XLA form kept behind
    ``RST_FUSED_WGRAD=0`` for A/B measurement."""
    import os

    if os.environ.get("RST_FUSED_WGRAD", "1") != "0":
        from rnn_speech_tpu.ops.grad_matmul_pallas import dgates_weight_grads

        return dgates_weight_grads(h_prev_seq, x, dgates, compute_dtype=cd)
    dg_c = dgates.astype(cd)
    dw_h = jnp.einsum(
        "tbh,tbg->hg", h_prev_seq.astype(cd), dg_c,
        preferred_element_type=jnp.float32,
    )
    dw_x = jnp.einsum(
        "tbd,tbg->dg", x.astype(cd), dg_c,
        preferred_element_type=jnp.float32,
    )
    db = jnp.sum(dgates, axis=(0, 1), dtype=jnp.float32)
    return dw_h, dw_x, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _lstm_core(w_x, w_h, b, x, mask, c0, h0, cd, rd):
    """Fused LSTM layer. Returns (out (T, B, H), cn, hn); ``mask`` is the
    (T, 1, B) float validity mask, ``cd`` the MXU compute dtype, ``rd``
    the storage dtype for backward residuals."""
    x_proj = (
        jnp.dot(x.astype(cd), w_x.astype(cd), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )
    out, hn, cn = lstm_recurrence_pallas(
        x_proj, w_h.astype(cd), mask, h0.astype(jnp.float32),
        c0.astype(jnp.float32),
    )
    return out, cn, hn


def _lstm_core_fwd(w_x, w_h, b, x, mask, c0, h0, cd, rd):
    x_proj = (
        jnp.dot(x.astype(cd), w_x.astype(cd), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )
    out, hn, cn, gates_act, c_seq = _lstm_recurrence_train(
        x_proj, w_h.astype(cd), mask, h0.astype(jnp.float32),
        c0.astype(jnp.float32), rd,
    )
    residuals = (w_x, w_h, x, mask, c0, h0, out, gates_act, c_seq)
    return (out, cn, hn), residuals


def _lstm_core_bwd(cd, rd, residuals, cotangents):
    w_x, w_h, x, mask, c0, h0, out, gates_act, c_seq = residuals
    dout, dcn, dhn = cotangents
    T, B, H = out.shape

    c_prev_seq = jnp.concatenate(
        [c0.astype(rd)[None], c_seq[:-1]], axis=0
    )
    dgates, dh0, dc0 = _lstm_recurrence_bwd(
        dout, gates_act, c_seq, c_prev_seq, mask, w_h.astype(cd), dhn, dcn
    )

    # Valid steps have contiguous-prefix masking, so out[t-1] equals the
    # carried h_{t-1} wherever dgates[t] is nonzero; padded rows contribute
    # zero because dgates is already masked.
    h_prev_seq = jnp.concatenate(
        [h0.astype(jnp.float32)[None], out[:-1]], axis=0
    )
    dw_h, dw_x, db = _weight_grads(h_prev_seq, x, dgates, cd)
    dw_h = dw_h.astype(w_h.dtype)
    dw_x = dw_x.astype(w_x.dtype)
    dx = jnp.einsum(
        "tbg,dg->tbd", dgates.astype(cd), w_x.astype(cd),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return (dw_x, dw_h, db, dx, jnp.zeros_like(mask), dc0.astype(c0.dtype),
            dh0.astype(h0.dtype))


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _lstm_core_recompute(w_x, w_h, b, x, mask, c0, h0, cd, rd):
    """Recompute-mode fused LSTM layer: same primal as ``_lstm_core``,
    but the backward recomputes the gate activations from streamed
    ``x``/``h_prev`` (residual dtype) with both weight matrices
    VMEM-resident, storing only the cell sequence — the leanest residual
    strategy (fits whole-sequence B=96 at T=3510 on a v5e, where the
    gates residuals top out at B=64; B=128 exceeds HBM in every mode)."""
    return _lstm_core(w_x, w_h, b, x, mask, c0, h0, cd, rd)


def _lstm_core_recompute_fwd(w_x, w_h, b, x, mask, c0, h0, cd, rd):
    # The projected-gates stream is the layer's largest live tensor
    # ((T,B,4H): 6.9 GB f32 at B=128/T=3510) and only feeds a per-step
    # add inside the recurrence, so it narrows to the residual dtype and
    # the kernel upcasts each (1,B,4H) block — the accumulation itself
    # stays f32.  This is what admits whole-sequence B=128 on a v5e
    # (16.4 GB -> under budget); bf16 rounding of the pre-activations is
    # within this mode's existing rd-limited backward precision.
    x_proj = (
        jnp.dot(x.astype(cd), w_x.astype(cd), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    ).astype(rd)
    out, hn, cn, c_seq = _lstm_recurrence_train_lean(
        x_proj, w_h.astype(cd), mask, h0.astype(jnp.float32),
        c0.astype(jnp.float32), rd,
    )
    # Residuals narrow to the residual dtype; the f32 out/x stay alive
    # only through the surrounding forward, not until the backward.  The
    # zero-size token carries x's primal dtype so the backward can emit a
    # matching cotangent (callers may feed bf16 inter-layer activations).
    residuals = (w_x, w_h, b, x.astype(rd), mask, c0, h0, out.astype(rd),
                 c_seq, jnp.zeros((0,), x.dtype))
    return (out, cn, hn), residuals


def _lstm_core_recompute_bwd(cd, rd, residuals, cotangents):
    w_x, w_h, b, x_rd, mask, c0, h0, out_rd, c_seq, x_token = residuals
    dout, dcn, dhn = cotangents
    # dout may arrive bf16 (bf16 inter-layer activations); the kernel
    # upcasts per block, so no f32 materialization of the stream here.
    T, B, H = out_rd.shape

    h_prev_seq = jnp.concatenate([h0.astype(rd)[None], out_rd[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([c0.astype(rd)[None], c_seq[:-1]], axis=0)
    dgates, dh0, dc0 = _lstm_recurrence_bwd_recompute(
        dout, x_rd, h_prev_seq, c_seq, c_prev_seq, mask,
        w_x.astype(cd), b.astype(jnp.float32).reshape(1, -1),
        w_h.astype(cd), dhn, dcn,
    )

    dw_h, dw_x, db = _weight_grads(h_prev_seq, x_rd, dgates, cd)
    dw_h = dw_h.astype(w_h.dtype)
    dw_x = dw_x.astype(w_x.dtype)
    dx = jnp.einsum(
        "tbg,dg->tbd", dgates.astype(cd), w_x.astype(cd),
        preferred_element_type=jnp.float32,
    ).astype(x_token.dtype)
    return (dw_x, dw_h, db, dx, jnp.zeros_like(mask), dc0.astype(c0.dtype),
            dh0.astype(h0.dtype))


_lstm_core_recompute.defvjp(_lstm_core_recompute_fwd, _lstm_core_recompute_bwd)


def lstm_layer_pallas(
    params,
    x: jnp.ndarray,             # (T, B, D)
    seq_lengths: jnp.ndarray,   # (B,)
    state,                      # (c, h)
    compute_dtype=jnp.float32,
    residual_dtype=None,
    residual_mode: str = "gates",
):
    """Drop-in replacement for lstm.lstm_layer_scan on TPU (differentiable).

    ``residual_dtype`` controls backward-residual storage; by default it
    follows the compute dtype (bf16 compute -> bf16 residuals), which is
    what halves training's activation HBM footprint at long T.

    ``residual_mode``:
      * ``"gates"`` — stream the activated gates forward (cuDNN strategy):
        cheapest backward, ~5H residual bytes per step and layer.
      * ``"recompute"`` — store only the cell sequence and recompute the
        gates inside the backward kernel (two extra VMEM-resident matmuls
        per step): ~3H residual bytes — fits whole-sequence batches gates
        mode cannot (B=96 at T=3510 on a v5e; B=128 exceeds HBM in every
        mode).
    """
    T, B, _ = x.shape
    if residual_dtype is None:
        residual_dtype = (
            jnp.bfloat16 if jnp.dtype(compute_dtype) == jnp.bfloat16
            else jnp.float32
        )
    mask = (jnp.arange(T)[:, None] < seq_lengths[None, :]).astype(
        jnp.float32
    )[:, None, :]
    c0, h0 = state
    if residual_mode not in ("gates", "recompute"):
        raise ValueError(
            f"residual_mode must be 'gates' or 'recompute', got "
            f"{residual_mode!r}"
        )
    core = _lstm_core if residual_mode == "gates" else _lstm_core_recompute
    out, cn, hn = core(
        params["w_x"], params["w_h"], params["b"], x, mask, c0, h0,
        compute_dtype, jnp.dtype(residual_dtype),
    )
    return out, (cn, hn)
