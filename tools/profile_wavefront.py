#!/usr/bin/env python
"""Stage breakdown of the flagship WAVEFRONT train step on the chip.

Times, in isolation: the full train step, the loss fwd (no grad), the
loss fwd+bwd, the wavefront stack fwd-only / fwd+bwd at flagship shapes,
CTC value+grad, the device frontend, the greedy-decode + edit-distance
train metric, and the Adam update — so the gap between the ~264 ms step
and its components is attributable.

The B=64 whole-sequence backward fills HBM almost exactly (the train
step fits; see ops/lstm_wavefront.py's aliasing notes), so each stage
runs in its OWN subprocess — leftover buffers from a previous stage are
enough to push the next one out of memory.

Methodology follows tools/profile_step.py: slope timing, outputs fully
materialized, ONE leaf element fetched as proof of completion.

Run: python tools/profile_wavefront.py [--json out.json]
     python tools/profile_wavefront.py --stage step   # one stage, inline
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS, HIDDEN, LABELS = 3, 1024, 80
T_FRAMES, MAX_LABEL, B = 3510, 600, 64
ITER = 5

STAGES = [
    "step", "fwd", "fwdbwd", "stack_fwd", "stack_train_fwd",
    "stack_fwdbwd", "ctc", "frontend", "metric", "adam",
]


def _timeit(name, fn, *args, results=None):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)

    def _run(n):
        t0 = time.perf_counter()
        outs = None
        for _ in range(n):
            outs = fn(*args)
        leaf = jax.tree_util.tree_leaves(outs)[0]
        jax.device_get(jnp.ravel(leaf)[0])
        return time.perf_counter() - t0

    n1, n2 = ITER, 4 * ITER
    dt = min((_run(n2) - _run(n1)) / (n2 - n1) for _ in range(2))
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    if results is not None:
        results[name] = round(dt * 1e3, 2)
    return out


def run_stage(stage: str, results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend
    from rnn_speech_tpu.train import optim
    from rnn_speech_tpu.train import step as step_mod
    from rnn_speech_tpu.train.pipeline import PipelineConfig

    bf = jnp.bfloat16
    pcfg = PipelineConfig(batch_size=B, max_input_seq_length=T_FRAMES,
                          max_target_seq_length=MAX_LABEL)
    fe = DeviceFrontend("fbank", sr=pcfg.sample_rate,
                        max_samples=pcfg.max_samples)
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=bf, use_pallas=True,
        wavefront=True,
    )
    scfg = step_mod.StepConfig(model=cfg, frontend=fe, use_pallas_ctc=True)
    rng = np.random.default_rng(1)
    micro = {
        "audio": jnp.asarray(
            rng.normal(0, 0.1, (B, pcfg.max_samples)).astype(np.float32)),
        "audio_lengths": jnp.full((B,), pcfg.max_samples, jnp.int32),
        "labels": jnp.asarray(
            rng.integers(1, LABELS - 1, (B, MAX_LABEL)).astype(np.int32)),
        "label_lengths": jnp.full((B,), 250, jnp.int32),
    }
    key = jax.random.key(0, impl="rbg")

    if stage == "step":
        state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, B, 3e-4)
        batch = {k: v[None] for k, v in micro.items()}
        no_reset = jnp.asarray(False)
        train_fn = jax.jit(step_mod.train_step, static_argnums=0)
        _timeit("full train step", lambda: train_fn(scfg, state, batch, key,
                                                    no_reset),
                results=results)
        return

    if stage in ("fwd", "fwdbwd", "metric", "adam"):
        state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, B, 3e-4)
        feats, frame_lengths = step_mod._featurize_micro(scfg, micro)
        states = acoustic.zero_state(cfg, B)

        def loss(params, k):
            l, _ = step_mod._micro_loss(
                params, scfg, states, feats, frame_lengths,
                micro["labels"], micro["label_lengths"], k)
            return l

        if stage == "fwd":
            _timeit("loss fwd only", jax.jit(loss), state["params"], key,
                    results=results)
        elif stage == "fwdbwd":
            _timeit("loss fwd+bwd (value_and_grad)",
                    jax.jit(jax.value_and_grad(loss)), state["params"], key,
                    results=results)
        elif stage == "metric":
            from rnn_speech_tpu.ops import decode, editdistance

            logits = jnp.asarray(
                rng.normal(0, 1.0, (T_FRAMES, B, LABELS)).astype(np.float32))

            def metric(lg):
                pred, pred_len = decode.greedy_decode(
                    lg, frame_lengths, max_output=MAX_LABEL)
                return editdistance.error_rate(
                    pred, pred_len, micro["labels"], micro["label_lengths"])

            _timeit("greedy decode + edit distance (train metric)",
                    jax.jit(metric), logits, results=results)
        else:
            # Synthetic grads: the real backward OOMs next to a resident
            # opt state in the same process; adam cost is grad-agnostic.
            grads = jax.tree.map(
                lambda p: jnp.full_like(p, 1e-4), state["params"])

            def adam(params, opt, grads):
                clipped, _ = optim.clip_by_global_norm(grads, 1.0)
                return optim.adam_update(params, clipped, opt,
                                         jnp.asarray(3e-4, jnp.float32))

            _timeit("clip + adam update", jax.jit(adam), state["params"],
                    state["opt"], grads, results=results)
        return

    if stage.startswith("stack"):
        from rnn_speech_tpu.ops import lstm

        # The stack's input is the input projection's output: dim = HIDDEN.
        layers = lstm.init_lstm_stack(jax.random.PRNGKey(0), LAYERS,
                                      HIDDEN, HIDDEN)
        x = jnp.asarray(rng.normal(0, 0.5, (T_FRAMES, B, HIDDEN))
                        .astype(np.float32))
        lens = jnp.full((B,), T_FRAMES, jnp.int32)
        st = [tuple(s) for s in lstm.zero_state(LAYERS, B, HIDDEN)]

        def stack_fwd(layers, x):
            out, _ = lstm.lstm_stack(layers, x, lens, st, compute_dtype=bf,
                                     use_pallas=True, wavefront=True,
                                     dropout_rng=None)
            return out

        def stack_train(layers, x, k):
            out, _ = lstm.lstm_stack(layers, x, lens, st, compute_dtype=bf,
                                     use_pallas=True, wavefront=True,
                                     dropout_rng=k,
                                     input_keep_prob=0.8,
                                     output_keep_prob=0.5)
            return out

        if stage == "stack_fwd":
            _timeit("wavefront stack fwd (inference kernel)",
                    jax.jit(stack_fwd), layers, x, results=results)
        elif stage == "stack_train_fwd":
            _timeit("wavefront stack train fwd (residuals+dropout)",
                    jax.jit(stack_train), layers, x, key, results=results)
        else:
            _timeit("wavefront stack train fwd+bwd",
                    jax.jit(jax.value_and_grad(
                        lambda p, k: stack_train(p, x, k)
                        .astype(jnp.float32).mean()
                    )), layers, key, results=results)
        return

    if stage == "ctc":
        from rnn_speech_tpu.ops import ctc_pallas

        logits = jnp.asarray(rng.normal(0, 1.0, (T_FRAMES, B, LABELS))
                             .astype(np.float32))
        loglens = jnp.full((B,), T_FRAMES, jnp.int32)

        def ctc_loss(lg):
            return ctc_pallas.ctc_loss(lg, loglens, micro["labels"],
                                       micro["label_lengths"]).mean()

        _timeit("CTC value+grad (pallas)",
                jax.jit(jax.value_and_grad(ctc_loss)), logits,
                results=results)
        return

    if stage == "frontend":
        _timeit("frontend featurize", jax.jit(
            lambda a, al: fe(a, al)), micro["audio"],
            micro["audio_lengths"], results=results)
        return

    raise SystemExit(f"unknown stage {stage!r}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--stage", default="",
                    help="run ONE stage inline (default: all, each in a "
                         "fresh subprocess)")
    args = ap.parse_args()

    results = {}
    if args.stage:
        run_stage(args.stage, results)
    else:
        for stage in STAGES:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", stage, "--json", "/tmp/_wf_stage.json"],
                capture_output=True, text=True)
            sys.stdout.write(out.stdout)
            sys.stdout.flush()
            if out.returncode != 0:
                print(f"[stage {stage} FAILED]\n{out.stderr[-2000:]}",
                      flush=True)
                continue
            with open("/tmp/_wf_stage.json") as fh:
                results.update(json.load(fh))

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
