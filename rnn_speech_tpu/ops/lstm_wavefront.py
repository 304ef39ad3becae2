"""Cross-layer wavefront LSTM stack: one Pallas kernel for ALL layers.

The layered path (ops/lstm_pallas.py) runs the 3-layer stack as three
sequential pallas_calls, each walking T grid steps, with a full-occupancy
``x·W_x`` matmul between layers.  Its per-step ``(B, H)·(H, 4H)`` matmul
fills only B of the MXU's 128 rows — at the flagship train shape (B=64)
that half-occupancy latency chain of 3·T steps is DESIGN.md's measured
floor for the whole train step.

This kernel walks the (layer, time) DIAGONAL instead — the cuDNN
multi-layer trick (VERDICT r3 #2): grid step ``s`` computes, for every
layer ``l`` with ``0 <= s - l < T``, that layer's timestep ``t = s - l``.
The three per-step matmuls at a diagonal are data-independent, so the MXU
pipeline stays fed across them (no inter-matmul dependency stalls), the
grid shrinks from ``L·T`` to ``T + L - 1`` steps (fixed per-step pipeline
overhead amortizes L-fold), and the inter-layer activations never touch
HBM — layers 1..L-1 read their input straight from the lower layer's VMEM
state and apply their OWN input projection ``h^{l-1}·W_x`` in-kernel.

The trade being measured: those in-kernel ``W_x`` matmuls replace
full-occupancy (T·B)-row XLA matmuls with B-row per-step matmuls, and all
L weight sets must stay VMEM-resident (~42 MB at 3×1024 bf16).  Semantics
are identical to the layered path (each layer still sees its input
exactly one diagonal after it is produced — a schedule change, not a math
change); pinned against the layered forward by tests/test_lstm_wavefront.py.

Replaces the reference's stacked ``MultiRNNCell`` + ``dynamic_rnn`` time
loop (/root/reference/models/AcousticModel.py:223-237,276-278) for the
inference forward when ``RST_WAVEFRONT=1``; tools/wavefront_ab.py holds
the on-chip A/B against the layered path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 << 20


def _wavefront_kernel(n_layers, T, *refs):
    """refs layout: xp0, w_h, w_x, b, mask_0..mask_{L-1}, h0, c0,
    out, hn, cn, h_s, c_s."""
    L = n_layers
    xp0_ref, wh_ref, wx_ref, b_ref = refs[:4]
    mask_refs = refs[4 : 4 + L]
    h0_ref, c0_ref, out_ref, hn_ref, cn_ref, h_s, c_s = refs[4 + L :]

    s = pl.program_id(0)

    # Descending layer order: layer l reads the lower layer's state from
    # the PREVIOUS diagonal before layer l-1 overwrites it on this one.
    for l in reversed(range(L)):
        t_l = s - l

        @pl.when((s >= l) & (t_l < T))
        def _(l=l, t_l=t_l):
            @pl.when(t_l == 0)
            def _():
                h_s[l] = h0_ref[l]
                c_s[l] = c0_ref[l]

            h = h_s[l]
            c = c_s[l]
            H = h.shape[-1]
            if l == 0:
                gates = xp0_ref[0] + jnp.dot(
                    h.astype(wh_ref.dtype), wh_ref[0],
                    preferred_element_type=jnp.float32,
                )
            else:
                x_in = h_s[l - 1]       # lower layer's h at this same t
                gates = (
                    b_ref[l - 1, 0]
                    + jnp.dot(
                        x_in.astype(wx_ref.dtype), wx_ref[l - 1],
                        preferred_element_type=jnp.float32,
                    )
                    + jnp.dot(
                        h.astype(wh_ref.dtype), wh_ref[l],
                        preferred_element_type=jnp.float32,
                    )
                )
            i = gates[:, :H]
            g = gates[:, H : 2 * H]
            f = gates[:, 2 * H : 3 * H]
            o = gates[:, 3 * H :]
            c_new = (
                jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            )
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

            m = mask_refs[l][0, 0][:, None]      # (B, 1) float {0, 1}
            c_s[l] = m * c_new + (1.0 - m) * c
            h_s[l] = m * h_new + (1.0 - m) * h
            if l == L - 1:
                out_ref[0] = m * h_new

            @pl.when(t_l == T - 1)
            def _():
                hn_ref[l] = h_s[l]
                cn_ref[l] = c_s[l]


def lstm_stack_wavefront(
    x_proj0: jnp.ndarray,    # (T, B, 4H) f32 — layer-0 projection + bias
    w_h: jnp.ndarray,        # (L, H, 4H) compute dtype
    w_x_rest: jnp.ndarray,   # (L-1, H, 4H) compute dtype — layers 1..L-1
    b_rest: jnp.ndarray,     # (L-1, 1, 4H) f32
    mask: jnp.ndarray,       # (T, 1, B) f32 validity mask
    h0: jnp.ndarray,         # (L, B, H) f32
    c0: jnp.ndarray,         # (L, B, H) f32
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the whole L-layer recurrence as one diagonal-walking kernel.

    Returns (out (T, B, H) — the TOP layer's masked output sequence,
    hn (L, B, H), cn (L, B, H))."""
    T, B, four_h = x_proj0.shape
    H = four_h // 4
    L = w_h.shape[0]
    if w_x_rest.shape[0] != L - 1 or b_rest.shape[0] != L - 1:
        raise ValueError("w_x_rest/b_rest must cover layers 1..L-1")

    clamp_t = lambda s, off: (jnp.clip(s - off, 0, T - 1), 0, 0)
    kernel = functools.partial(_wavefront_kernel, L, T)
    in_specs = [
        pl.BlockSpec((1, B, four_h), lambda s: clamp_t(s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, H, four_h), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L - 1, H, four_h), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L - 1, 1, four_h), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, 1, B), functools.partial(clamp_t, off=l),
                     memory_space=pltpu.VMEM)
        for l in range(L)
    ] + [
        pl.BlockSpec((L, B, H), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, B, H), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out, hn, cn = pl.pallas_call(
        kernel,
        grid=(T + L - 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, B, H), functools.partial(clamp_t, off=L - 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, B, H), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, B, H), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((L, B, H), jnp.float32),
            jax.ShapeDtypeStruct((L, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, B, H), jnp.float32),
            pltpu.VMEM((L, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h * (2 * L - 1),
            bytes_accessed=T * B * (four_h + H) * 4
            + (2 * L - 1) * H * four_h * w_h.dtype.itemsize,
            transcendentals=4 * L * T * B * H,
        ),
        interpret=interpret,
    )(x_proj0, w_h, w_x_rest, b_rest, *([mask] * L), h0, c0)
    return out, hn, cn


def lstm_stack_wavefront_apply(
    layer_params,            # sequence of {"w_x", "w_h", "b"} dicts
    x: jnp.ndarray,          # (T, B, D) input features (post input-proj)
    seq_lengths: jnp.ndarray,
    states,                  # sequence of (c, h) per layer
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Convenience wrapper matching the layered stack's calling shape:
    precomputes layer 0's input projection (full-occupancy matmul), stacks
    the per-layer weights, and returns (out, [(c, h)] per layer)."""
    T, B, _ = x.shape
    cd = compute_dtype
    p0 = layer_params[0]
    xp0 = jnp.dot(
        x.astype(cd), p0["w_x"].astype(cd),
        preferred_element_type=jnp.float32,
    ) + p0["b"].astype(jnp.float32)
    w_h = jnp.stack([p["w_h"].astype(cd) for p in layer_params])
    w_x_rest = jnp.stack([p["w_x"].astype(cd) for p in layer_params[1:]])
    b_rest = jnp.stack(
        [p["b"].astype(jnp.float32).reshape(1, -1) for p in layer_params[1:]]
    )
    mask = (jnp.arange(T)[:, None] < seq_lengths[None, :]).astype(
        jnp.float32
    )[:, None, :]
    c0 = jnp.stack([c.astype(jnp.float32) for c, _ in states])
    h0 = jnp.stack([h.astype(jnp.float32) for _, h in states])
    out, hn, cn = lstm_stack_wavefront(
        xp0, w_h, w_x_rest, b_rest, mask, h0, c0, interpret=interpret
    )
    return out, [(cn[l], hn[l]) for l in range(len(layer_params))]
