#!/usr/bin/env python
"""A/B the cross-layer wavefront LSTM kernel against the layered path.

VERDICT r3 #2: DESIGN.md's latency-floor argument for training at B=64
stopped one idea short — cross-layer wavefront pipelining (layer l
computes step t while layer l+1 computes t-1; the cuDNN multi-layer
trick).  ops/lstm_wavefront.py implements it for the forward; this
harness measures both schedules at the shapes that matter:

  * train forward shape: B=64, T=3510 (the reference's whole-sequence
    training unit — /root/reference/models/AcousticModel.py:223-237)
  * eval forward shape:  B=128, T=1024 (bench.py's eval workload)

Both paths run ONLY the recurrence stack (input projection included in
both, output projection excluded) so the delta isolates the schedule.
Run on the chip: `python tools/wavefront_ab.py [--T 3510 --B 64]`.
Prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, args, iters: int, warmup: int = 2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][:1])
    return (time.perf_counter() - t0) / iters


def run_shape(T: int, B: int, H: int, L: int, D: int, iters: int,
              compute_dtype) -> dict:
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.ops import lstm
    from rnn_speech_tpu.ops.lstm_pallas import lstm_layer_pallas
    from rnn_speech_tpu.ops.lstm_wavefront import lstm_stack_wavefront_apply

    key = jax.random.PRNGKey(0)
    layers = lstm.init_lstm_stack(key, L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    states = lstm.zero_state(L, B, H)

    @jax.jit
    def layered(layers, x):
        outs = x
        for p, st in zip(layers, states):
            outs, _ = lstm_layer_pallas(
                p, outs, lengths, st, compute_dtype=compute_dtype
            )
        return outs

    @jax.jit
    def wavefront(layers, x):
        out, _ = lstm_stack_wavefront_apply(
            layers, x, lengths, states, compute_dtype=compute_dtype
        )
        return out

    t_layer = measure(layered, (layers, x), iters)
    t_wave = measure(wavefront, (layers, x), iters)

    # MXU FLOPs of the recurrence stack (both paths run the same math).
    dims = [D] + [H] * (L - 1)
    flops = sum(2 * T * B * (d + H) * 4 * H for d in dims)
    return {
        "T": T, "B": B, "H": H, "L": L,
        "layered_ms": round(1e3 * t_layer, 2),
        "wavefront_ms": round(1e3 * t_wave, 2),
        "speedup": round(t_layer / t_wave, 3),
        "layered_tflops": round(flops / t_layer / 1e12, 2),
        "wavefront_tflops": round(flops / t_wave / 1e12, 2),
        "utt_equiv_per_sec_layered": round(B / t_layer, 1),
        "utt_equiv_per_sec_wavefront": round(B / t_wave, 1),
    }


def run_train_shape(T: int, B: int, H: int, L: int, D: int, iters: int,
                    compute_dtype) -> dict:
    """Train-step (fwd+bwd through the stack) A/B: layered gates-mode vs
    wavefront forward with layered backward vs wavefront forward + fused
    reverse-diagonal backward.  Dropout off so all three run identical
    math; residuals in the compute dtype (the training default)."""
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.ops import lstm
    from rnn_speech_tpu.ops.lstm_pallas import lstm_layer_pallas
    from rnn_speech_tpu.ops.lstm_wavefront import lstm_stack_wavefront_train

    key = jax.random.PRNGKey(0)
    layers = lstm.init_lstm_stack(key, L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    states = lstm.zero_state(L, B, H)
    # NOTE: wy must be a jit ARGUMENT — as a closure constant this
    # (T, B, H) f32 tensor (919 MB at flagship shapes) is embedded in the
    # program and the tunneled remote-compile RPC dies shipping it.
    wy = jax.random.normal(jax.random.PRNGKey(2), (T, B, H)) * 0.02

    def layered_loss(params_list, xx, wy):
        out = xx
        for p, st in zip(params_list, states):
            out, _ = lstm_layer_pallas(
                p, out, lengths, st, compute_dtype=compute_dtype
            )
        return jnp.sum(out * wy)

    def wave_loss(bwd):
        def inner(params_list, xx, wy):
            out, _ = lstm_stack_wavefront_train(
                params_list, xx, lengths, states,
                compute_dtype=compute_dtype, bwd_wavefront=bwd,
            )
            return jnp.sum(out * wy)
        return inner

    grad_layered = jax.jit(jax.grad(layered_loss))
    grad_wave_lb = jax.jit(jax.grad(wave_loss(False)))
    grad_wave_full = jax.jit(jax.grad(wave_loss(True)))

    t_layer = measure(grad_layered, (layers, x, wy), iters)
    t_wave_lb = measure(grad_wave_lb, (layers, x, wy), iters)
    t_wave = measure(grad_wave_full, (layers, x, wy), iters)

    dims = [D] + [H] * (L - 1)
    # fwd + dgates·W_h^T/W_x^T bwd + dW_h/dW_x wgrad ≈ 3x the fwd matmuls.
    flops = 3 * sum(2 * T * B * (d + H) * 4 * H for d in dims)
    return {
        "mode": "train", "T": T, "B": B, "H": H, "L": L,
        "layered_ms": round(1e3 * t_layer, 2),
        "wavefront_fwd_only_ms": round(1e3 * t_wave_lb, 2),
        "wavefront_ms": round(1e3 * t_wave, 2),
        "speedup_fwd_only": round(t_layer / t_wave_lb, 3),
        "speedup": round(t_layer / t_wave, 3),
        "layered_tflops": round(flops / t_layer / 1e12, 2),
        "wavefront_tflops": round(flops / t_wave / 1e12, 2),
        "utt_equiv_per_sec_layered": round(B / t_layer, 1),
        "utt_equiv_per_sec_wavefront": round(B / t_wave, 1),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=0,
                        help="run only this T (default: both standard shapes)")
    parser.add_argument("--B", type=int, default=64)
    parser.add_argument("--H", type=int, default=1024)
    parser.add_argument("--L", type=int, default=3)
    parser.add_argument("--D", type=int, default=1024,
                        help="input dim fed to layer 0 (post input-proj)")
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--f32", action="store_true",
                        help="f32 weights instead of bf16")
    parser.add_argument("--train", action="store_true",
                        help="A/B the train step (fwd+bwd) instead of "
                             "the inference forward")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    cd = jnp.float32 if args.f32 else jnp.bfloat16
    print(f"devices: {jax.devices()}", file=sys.stderr)
    shapes = (
        [(args.T, args.B)] if args.T
        else ([(3510, 64)] if args.train else [(3510, 64), (1024, 128)])
    )
    fn = run_train_shape if args.train else run_shape
    for T, B in shapes:
        out = fn(T, B, args.H, args.L, args.D, args.iters, cd)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
