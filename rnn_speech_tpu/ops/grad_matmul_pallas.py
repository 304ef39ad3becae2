"""Fused Pallas weight-gradient contraction for the LSTM backward pass.

The layer backward needs three reductions over the flattened time-batch
axis N = T*B (``ops/lstm_pallas.py::_lstm_core_bwd``):

    dW_h = h_prevᵀ · dgates      (H, 4H)
    dW_x = xᵀ · dgates           (D, 4H)
    db   = Σ_N dgates            (4H,)

As separate XLA einsums each re-streams the (N, 4H) dgates tensor from
HBM (~1.8 GB in bf16 at reference shapes) and runs a tall-k reduction
matmul at ~55-60% MXU efficiency.  Here one ``pallas_call`` streams
h_prev, x and dgates exactly once: the grid walks (4H tiles × N chunks)
with N innermost, and both weight-gradient tiles plus the bias row
accumulate in VMEM-resident f32 blocks across the N chunks (output block
index maps are constant in the N grid dimension, so Pallas keeps them
resident).  dgates is read once instead of three times and the MXU sees
back-to-back (Nc, H)ᵀ·(Nc, Gt) contractions with no accumulator spills.

Replaces the backward matmuls of ``tf.nn.dynamic_rnn``'s autodiff
(/root/reference/models/AcousticModel.py:887-939 is the training step
this feeds); numerics are pinned against the einsum forms by
tests/test_grad_matmul.py (interpret mode) and tools/hw_parity.py (chip).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_speech_tpu.ops import pallas_vma

# N rows consumed per grid step and 4H columns per output tile.  At
# H=1024, Gt=1024, Nc=512: lhs blocks 2x (512, 1024) bf16 = 2 MiB, rhs
# (512, 1024) bf16 = 1 MiB, accumulators (1024+D, 1024) f32 ~ 8 MiB.
_N_CHUNK = 512
_G_TILE = 1024

# Scoped-VMEM ceiling requested from the compiler.  The default 16 MiB
# limit OOMs at flagship shapes because Pallas revolves (double-buffers)
# the accumulator blocks across the G grid dimension — the (H+D, Gt) f32
# accumulators alone cost 2 x 8.4 MiB there.  v5e/v4 chips carry 128 MiB
# of VMEM; we ask for exactly what the plan needs, capped well below that.
_VMEM_CAP = 96 << 20


def _grad_kernel(cd, h_ref, x_ref, dg_ref, dwh_ref, dwx_ref, db_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # h/x arrive pre-cast to the compute dtype (halving their VMEM blocks
    # buys a longer N chunk, which amortizes per-grid-step overhead better
    # than saving their one-off cast pass).  dg keeps its caller dtype:
    # db must accumulate the UNROUNDED cotangent, and in the LSTM path
    # dgates is already in the residual dtype anyway.
    dg = dg_ref[:]
    dg_c = dg.astype(cd)
    contract0 = (((0,), (0,)), ((), ()))
    dwh_ref[:] += jax.lax.dot_general(
        h_ref[:], dg_c, contract0, preferred_element_type=jnp.float32)
    dwx_ref[:] += jax.lax.dot_general(
        x_ref[:], dg_c, contract0, preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dg.astype(jnp.float32), axis=0, keepdims=True)


def _chunk_plan(n: int, bytes_per_row: int,
                acc_bytes: int) -> Tuple[int, bool, int]:
    """(rows per grid step, caller must pad?, vmem_limit_bytes).  Picks the
    largest divisor-of-n chunk whose double-buffered streamed blocks fit
    the VMEM budget next to the accumulators — which Pallas ALSO
    double-buffers, because their block index varies over the G grid
    dimension — then sizes the scoped-VMEM request to the plan (the
    compiler's 16 MiB default is too small for the flagship accumulators)."""
    budget = _VMEM_CAP - 2 * acc_bytes
    cap = max(8, min(_N_CHUNK, budget // (2 * bytes_per_row)))
    for c in (512, 480, 448, 416, 384, 320, 256, 192, 128, 64, 32, 16, 8):
        if c <= cap and n % c == 0:
            nc, needs_pad = c, False
            break
    else:
        nc, needs_pad = (cap // 8) * 8, True
    vmem = 2 * acc_bytes + 2 * nc * bytes_per_row + (2 << 20)
    return nc, needs_pad, min(vmem, _VMEM_CAP)


def _single_grad_kernel(cd, x_ref, dg_ref, dw_ref, db_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dg = dg_ref[:]
    dw_ref[:] += jax.lax.dot_general(
        x_ref[:], dg.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dg.astype(jnp.float32), axis=0, keepdims=True)


def weight_grad(
    x: jnp.ndarray,               # (..., D)
    dg: jnp.ndarray,              # (..., G)
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(dw (D, G) f32, db (G,) f32) = xᵀ·dg, Σ dg in one fused pass —
    the single-matrix sibling of :func:`dgates_weight_grads` (used for the
    output projection, where G is the label count)."""
    cd = jnp.dtype(compute_dtype)
    D, G = x.shape[-1], dg.shape[-1]
    x2 = x.reshape(-1, D).astype(cd)
    dg2 = dg.reshape(-1, G)
    n = x2.shape[0]
    gt = _G_TILE if G % _G_TILE == 0 else G
    bpr = D * x2.dtype.itemsize + gt * dg2.dtype.itemsize
    acc = 4 * (D + 1) * gt
    nc, needs_pad, vmem_limit = _chunk_plan(n, bpr, acc)
    if needs_pad:
        pad = -(-n // nc) * nc - n
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        dg2 = jnp.pad(dg2, ((0, pad), (0, 0)))
        n = n + pad
    dw, db = pallas_vma.pallas_call(
        functools.partial(_single_grad_kernel, cd),
        grid=(G // gt, n // nc),
        in_specs=[
            pl.BlockSpec((nc, D), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, gt), lambda g, i: (i, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, gt), lambda g, i: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, i: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * D * G,
            bytes_accessed=n * (D * x2.dtype.itemsize
                                + G * dg2.dtype.itemsize)
            + 4 * (D + 1) * G,
            transcendentals=0,
        ),
    )(x2, dg2)
    return dw, db[0]


def dgates_weight_grads(
    h_prev: jnp.ndarray,          # (T, B, H) or (N, H)
    x: jnp.ndarray,               # (T, B, D) or (N, D)
    dgates: jnp.ndarray,          # (T, B, G) or (N, G)
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dw_h (H, G) f32, dw_x (D, G) f32, db (G,) f32) with one
    fused pass over the three streams; inputs are flattened over leading
    axes and cast to ``compute_dtype`` for the MXU (f32 accumulation)."""
    cd = jnp.dtype(compute_dtype)
    H = h_prev.shape[-1]
    D = x.shape[-1]
    G = dgates.shape[-1]
    h2 = h_prev.reshape(-1, H).astype(cd)
    x2 = x.reshape(-1, D).astype(cd)
    dg2 = dgates.reshape(-1, G)
    n = h2.shape[0]
    gt = _G_TILE if G % _G_TILE == 0 else G
    bpr = (H * h2.dtype.itemsize + D * x2.dtype.itemsize
           + gt * dg2.dtype.itemsize)
    acc = 4 * (H + D + 1) * gt
    nc, needs_pad, vmem_limit = _chunk_plan(n, bpr, acc)
    if needs_pad:
        pad = -(-n // nc) * nc - n
        h2 = jnp.pad(h2, ((0, pad), (0, 0)))
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        dg2 = jnp.pad(dg2, ((0, pad), (0, 0)))
        n = n + pad
    grid = (G // gt, n // nc)
    dwh, dwx, db = pallas_vma.pallas_call(
        functools.partial(_grad_kernel, cd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nc, H), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, D), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, gt), lambda g, i: (i, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, gt), lambda g, i: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, gt), lambda g, i: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, i: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, G), jnp.float32),
            jax.ShapeDtypeStruct((D, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (H + D) * G,
            bytes_accessed=n * (H * h2.dtype.itemsize
                                + D * x2.dtype.itemsize
                                + G * dg2.dtype.itemsize)
            + 4 * (H + D + 1) * G,
            transcendentals=0,
        ),
    )(h2, x2, dg2)
    return dwh, dwx, db[0]
