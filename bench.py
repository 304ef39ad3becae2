#!/usr/bin/env python
"""Benchmark: eval throughput of the flagship acoustic model on one chip.

Measures utterances/sec/chip for the full eval path — on-device fbank-120
frontend + 3x1024 LSTM stack + greedy CTC decode — over a synthetic
LibriSpeech-like workload (10.24 s clips at 22.05 kHz, batch 16), and
compares against a torch-CPU equivalent forward (the reference ran
TF on host/GPU; torch-CPU is the reproducible stand-in for its CPU eval
path, per BASELINE.md's ">=10x TF-CPU eval throughput per chip" target).

Prints ONE JSON line:
  {"metric": "eval_utterances_per_sec_per_chip", "value": N,
   "unit": "utt/s", "vs_baseline": N}
where vs_baseline = our throughput / torch-CPU-equivalent throughput
(target >= 10).
"""

from __future__ import annotations

import json
import time

import numpy as np

SR = 22050
SECONDS = 10.24
MAX_SAMPLES = int(SR * SECONDS)
BATCH = 128   # peak utt/s on v5e (64: ~2100, 128: ~2600, 256: ~2500)
LAYERS, HIDDEN, LABELS = 3, 1024, 80
WARMUP, ITERS = 2, 30   # ITERS amortizes the end-of-run host fetch (~25 ms)


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops import decode
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    fe = DeviceFrontend("fbank", sr=SR, max_samples=MAX_SAMPLES)
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=jnp.bfloat16,
        use_pallas=jax.default_backend() != "cpu",
    )
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    states = acoustic.zero_state(cfg, BATCH)

    @jax.jit
    def eval_fn(params, audio, lengths):
        feats, nf = fe(audio, lengths)
        logits, _ = acoustic.forward(
            params, cfg, jnp.transpose(feats, (1, 0, 2)), nf, states
        )
        labels, lab_len = decode.greedy_decode(logits, nf, max_output=600)
        return labels, lab_len

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(0, 0.1, (BATCH, MAX_SAMPLES)).astype(np.float32))
    lengths = jnp.asarray(np.full((BATCH,), MAX_SAMPLES, np.int32))

    # The first executable loaded in a process times artificially fast on
    # the tunneled platform; compile a throwaway program so the measured
    # number reflects real multi-program processes.
    jax.block_until_ready(jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((128, 128))))

    for _ in range(WARMUP):
        jax.block_until_ready(eval_fn(params, audio, lengths))
    # Pipelined dispatch (what a real eval loop does): enqueue all batches,
    # block once — overlaps host dispatch with device execution.
    t0 = time.perf_counter()
    outs = [eval_fn(params, audio, lengths) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    # block_until_ready has been observed to return early on the tunneled
    # platform; the device executes enqueued programs in order, so fetching
    # a few bytes of the LAST iteration's output proves every iteration
    # actually finished (one small host transfer, amortized over ITERS).
    np.asarray(outs[-1][1])
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def bench_torch_cpu() -> float:
    """Reference-equivalent eval forward on CPU: same layer stack in torch."""
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    T = int(SECONDS / 0.01)  # frames at 10ms hop
    model = torch.nn.Sequential()
    with torch.no_grad():
        inp = torch.nn.Linear(120, HIDDEN)
        lstm = torch.nn.LSTM(HIDDEN, HIDDEN, num_layers=LAYERS)
        out = torch.nn.Linear(HIDDEN, LABELS)
        x = torch.randn(T, 1, 120)
        # Warm once, then time a single-utterance forward (batch 1, the
        # reference's --file/--evaluate unit of work per CPU thread pool).
        h = out(lstm(inp(x))[0])
        t0 = time.perf_counter()
        iters = 2
        for _ in range(iters):
            h = out(lstm(inp(x))[0])
        dt = time.perf_counter() - t0
    return iters / dt


def main() -> None:
    value = bench_tpu()
    try:
        baseline = bench_torch_cpu()
    except Exception:
        baseline = None
    vs = value / baseline if baseline else 0.0
    audio_sec_per_sec = value * SECONDS
    result = {
        "metric": "eval_utterances_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "utt/s",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(result))
    # Supplementary detail on stderr so the JSON line stays clean.
    import sys

    print(
        f"# RTFx={audio_sec_per_sec:.1f} (audio-sec/sec), "
        f"torch-cpu baseline={baseline and round(baseline, 3)} utt/s, "
        f"batch={BATCH}, clip={SECONDS}s, model={LAYERS}x{HIDDEN} fbank-120",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
