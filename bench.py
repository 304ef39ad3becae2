#!/usr/bin/env python
"""Benchmark: throughput of the flagship acoustic model on one chip.

Measures, in one process:
  * eval utterances/sec/chip — on-device fbank-120 frontend + 3x1024 LSTM
    stack + greedy CTC decode over a synthetic LibriSpeech-like workload
    (10.24 s clips at 22.05 kHz), vs a torch-CPU equivalent forward (the
    reproducible stand-in for the reference's CPU eval path, per
    BASELINE.md's ">=10x TF-CPU eval throughput per chip" target);
  * train ms/step and utt/s at REFERENCE shapes — 3x1024, T=3510 frames
    (35.1 s audio), no frame stacking — with the fused-batch + bf16
    residual + auto-time-chunk training path (VERDICT r1 #1);
  * beam-search decode throughput at widths 8 and 16, and beam-8 with
    AM+LM shallow fusion (VERDICT r1 #6).

Prints ONE JSON line.  The primary metric stays the round-1 eval number
(driver compatibility); train/beam results ride along as extra keys:
  {"metric": "eval_utterances_per_sec_per_chip", "value": N,
   "unit": "utt/s", "vs_baseline": N, "train_utt_per_sec": N,
   "train_ms_per_step": N, "train_batch": N, "beam8_utt_per_sec": N,
   "beam16_utt_per_sec": N, "beam8_lm_utt_per_sec": N,
   "beam8_trained_utt_per_sec": N, "beam16_trained_utt_per_sec": N,
   "beam8_lm_trained_utt_per_sec": N, "trained_fixture_error_rate": N}
The *_trained_* keys decode PEAKED logits: a quick flagship-shape
memorization train on rendered letters audio (VERDICT r2 #6).

Set RST_BENCH_FAST=1 to run only the primary eval metric.
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
FBANK_DIM = 120
BUNDLE_DIR = "trained_models/english-syllables"   # committed flagship bundle

# Known per-chip bf16 peaks (dense) for the MFU keys; override with
# RST_PEAK_TFLOPS when running on an unlisted part.
_PEAK_TFLOPS_BY_KIND = (
    ("v5 lite", 197.0), ("v5e", 197.0), ("v6", 918.0),
    ("v5p", 459.0), ("v5", 459.0), ("v4", 275.0),
)


def _measure_reps(run_once, reps: int = 3):
    """Repeat a timed measurement and report its spread (VERDICT r4 weak
    #4: driver-number drift across rounds — beam16 612.5 -> 589.7 utt/s —
    was unclassifiable without a recorded variance bound).  Returns
    (median, spread_pct, values): the median is the headline number, the
    spread (max-min as % of median) is the noise bound a future delta
    must clear to mean anything."""
    vals = [float(run_once()) for _ in range(reps)]
    med = float(np.median(vals))
    spread = 100.0 * (max(vals) - min(vals)) / med if med else 0.0
    return med, round(spread, 1), [round(v, 1) for v in vals]


def _peak_flops() -> float:
    import os

    import jax

    if os.environ.get("RST_PEAK_TFLOPS"):
        return float(os.environ["RST_PEAK_TFLOPS"]) * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for marker, tflops in _PEAK_TFLOPS_BY_KIND:
        if marker in kind:
            return tflops * 1e12
    return 0.0


def _stack_flops(T_frames: int, B: int, *, backward: bool = False,
                 residual_mode: str = "gates") -> float:
    """Analytic MXU FLOPs for the 3x1024 stack + IO projections (the
    conventional model-matmul count — frontend DFT/mel matmuls and VPU
    work excluded, so the MFU keys are lower bounds)."""
    H, V = HIDDEN, LABELS
    dims = [FBANK_DIM] + [H] * (LAYERS - 1)
    fwd = sum(2 * T_frames * B * (d + H) * 4 * H for d in dims)
    fwd += 2 * T_frames * B * H * V
    if not backward:
        return fwd
    # Per layer: dgates·W_h^T (H) + dW_h (H) + dW_x (d) + dx (d);
    # recompute mode re-runs both gate matmuls inside the backward.
    bwd = sum(2 * T_frames * B * (2 * d + 2 * H) * 4 * H for d in dims)
    if residual_mode == "recompute":
        bwd += sum(2 * T_frames * B * (d + H) * 4 * H for d in dims)
    bwd += 2 * 2 * T_frames * B * H * V          # dW_out + d(out-proj in)
    return fwd + bwd


def bench_tpu() -> float:
    import os

    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops import decode
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    on_tpu = jax.default_backend() != "cpu"
    fe = DeviceFrontend("fbank", sr=SR, max_samples=MAX_SAMPLES)
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=jnp.bfloat16,
        use_pallas=on_tpu,
        wavefront=on_tpu and os.environ.get("RST_WAVEFRONT", "1") != "0",
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

    def run_once():
        # Pipelined dispatch (what a real eval loop does): enqueue all
        # batches, block once — overlaps host dispatch with device
        # execution.
        t0 = time.perf_counter()
        outs = [eval_fn(params, audio, lengths) for _ in range(ITERS)]
        jax.block_until_ready(outs)
        # block_until_ready has been observed to return early on the
        # tunneled platform; the device executes enqueued programs in
        # order, so fetching a few bytes of the LAST iteration's output
        # proves every iteration actually finished (one small host
        # transfer, amortized over ITERS).
        np.asarray(outs[-1][1])
        return BATCH * ITERS / (time.perf_counter() - t0)

    return _measure_reps(run_once)


def bench_train() -> dict:
    """Train-step throughput at reference shapes (3x1024, T=3510 frames,
    no frame stacking), with a kernel-fallback ladder: if the newest
    Pallas paths fail on this chip/runtime (compile OOM, lowering bug),
    retry with them disabled rather than losing the train numbers — the
    result records which rung ran."""
    import os
    import sys
    import traceback

    LADDER = [
        ("", {}),
        ("no_wavefront", {"RST_WAVEFRONT": "0"}),
        ("no_fused_wgrad", {"RST_WAVEFRONT": "0",
                            "RST_FUSED_WGRAD": "0"}),
        ("legacy_kernels", {"RST_WAVEFRONT": "0",
                            "RST_FUSED_WGRAD": "0",
                            "RST_FUSED_DROPOUT": "0",
                            "RST_CTC_KBLOCK": "8"}),
    ]
    pinned = {k for k in ("RST_WAVEFRONT", "RST_FUSED_WGRAD",
                          "RST_FUSED_DROPOUT", "RST_CTC_KBLOCK")
              if k in os.environ}
    last = None
    for name, env in LADDER:
        if pinned and name:
            break               # explicit A/B run: no silent rung changes
        try:
            os.environ.update(env)
            out = _bench_train_once()
            if name:
                out["train_kernel_fallback"] = name
            return out
        except Exception as exc:  # noqa: BLE001 — any compile/runtime error
            traceback.print_exc(file=sys.stderr)
            last = exc
        finally:
            for k in env:
                os.environ.pop(k, None)
    raise last


def _bench_train_once() -> dict:
    """One bench_train attempt at the currently-selected kernel config:
    one fused device batch per step through the full compiled path —
    on-device frontend, Pallas LSTM fwd+bwd (bf16 residuals), Pallas CTC,
    Adam + global-norm clip."""
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend
    from rnn_speech_tpu.train import step as step_mod
    from rnn_speech_tpu.train.pipeline import PipelineConfig

    import os

    T_FRAMES, MAX_LABEL = 3510, 600
    B = int(os.environ.get("RST_TRAIN_B", "64"))
    pcfg = PipelineConfig(batch_size=B, max_input_seq_length=T_FRAMES,
                          max_target_seq_length=MAX_LABEL)
    fe = DeviceFrontend("fbank", sr=pcfg.sample_rate,
                        max_samples=pcfg.max_samples)
    on_tpu = jax.default_backend() != "cpu"
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=jnp.bfloat16, use_pallas=on_tpu,
        wavefront=on_tpu and os.environ.get("RST_WAVEFRONT", "1") != "0",
    )
    chunk, res_mode = acoustic.training_memory_plan(cfg, T_FRAMES, B)
    if os.environ.get("RST_TRAIN_CHUNK") is not None:
        chunk = int(os.environ["RST_TRAIN_CHUNK"])   # experiment override
    if os.environ.get("RST_TRAIN_RESIDUAL_MODE"):
        res_mode = os.environ["RST_TRAIN_RESIDUAL_MODE"]
    if chunk or res_mode != "gates":
        import dataclasses

        cfg = dataclasses.replace(cfg, time_chunk=chunk,
                                  residual_mode=res_mode)
    scfg = step_mod.StepConfig(model=cfg, frontend=fe,
                               use_pallas_ctc=on_tpu)
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, B, 3e-4)

    rng = np.random.default_rng(1)
    batch = {
        "audio": jnp.asarray(
            rng.normal(0, 0.1, (1, B, pcfg.max_samples)).astype(np.float32)
        ),
        "audio_lengths": jnp.full((1, B), pcfg.max_samples, jnp.int32),
        "labels": jnp.asarray(
            rng.integers(1, LABELS - 1, (1, B, MAX_LABEL)).astype(np.int32)
        ),
        "label_lengths": jnp.full((1, B), 250, jnp.int32),
    }
    train_fn = jax.jit(step_mod.train_step, static_argnums=0,
                       donate_argnums=(1,))
    key = jax.random.key(0, impl="rbg")
    no_reset = jnp.asarray(False)

    for _ in range(2):    # compile + one steady-state warmup
        state, metrics = train_fn(scfg, state, batch, key, no_reset)
    jax.block_until_ready(metrics)
    ITER = 5

    def run_once():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(ITER):
            state, m = train_fn(scfg, state, batch, key, no_reset)
        jax.block_until_ready(m)
        np.asarray(m["mean_loss"])      # tunnel-safe completion proof
        return B * ITER / (time.perf_counter() - t0)

    med, spread, _vals = _measure_reps(run_once)
    out = {
        "train_utt_per_sec": round(med, 3),
        "train_ms_per_step": round(1e3 * B / med, 1),
        "train_spread_pct": spread,
        "train_batch": B,
        "train_time_chunk": chunk,
        "train_residual_mode": res_mode,
    }
    peak = _peak_flops()
    if peak:
        per_utt = _stack_flops(T_FRAMES, 1, backward=True,
                               residual_mode=res_mode)
        out["mfu_train"] = round(out["train_utt_per_sec"] * per_utt / peak, 3)
    return out


def bench_beam(beam_width: int, with_lm: bool = False,
               batch: int = 32, iters: int = 4,
               params=None, audio=None, sr: int = SR) -> float:
    """Eval throughput with the on-device prefix beam search (and optional
    AM+LM shallow fusion) instead of greedy decode.

    With ``params``/``audio`` (see ``_bundle_fixture``) the decode runs
    on peaked trained-model logits over real rendered speech-like audio —
    random-init logits are near-uniform, which makes beam ties/merges
    maximally frequent and can misrepresent trained decode cost
    (VERDICT r2 #6).  ``sr`` follows the fixture's training sample rate
    (frame hop is 10 ms either way, so T and the decode shapes match)."""
    import os

    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops import decode
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    on_tpu = jax.default_backend() != "cpu"
    max_samples = int(sr * SECONDS)
    fe = DeviceFrontend("fbank", sr=sr, max_samples=max_samples)
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=jnp.bfloat16,
        use_pallas=on_tpu,
        wavefront=on_tpu and os.environ.get("RST_WAVEFRONT", "1") != "0",
    )
    if params is None:
        params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    states = acoustic.zero_state(cfg, batch)

    lm, lm_weight = None, 0.0
    if with_lm:
        from rnn_speech_tpu.models import language

        lm_cfg = language.LanguageConfig(
            num_layers=1, hidden_size=256, num_labels=LABELS
        )
        lm_params = language.init_params(jax.random.PRNGKey(2), lm_cfg)
        lm = language.stepper(lm_params, lm_cfg)
        lm_weight = 0.5

    @jax.jit
    def beam_fn(params, audio, lengths):
        feats, nf = fe(audio, lengths)
        logits, _ = acoustic.forward(
            params, cfg, jnp.transpose(feats, (1, 0, 2)), nf, states
        )
        labels, lengths_out, scores = decode.beam_search_decode(
            logits, nf, beam_width=beam_width, max_output=600,
            lm=lm, lm_weight=lm_weight,
        )
        return labels, lengths_out

    if audio is None:
        rng = np.random.default_rng(0)
        audio = jnp.asarray(
            rng.normal(0, 0.1, (batch, max_samples)).astype(np.float32)
        )
    lengths = jnp.asarray(np.full((batch,), max_samples, np.int32))
    jax.block_until_ready(beam_fn(params, audio, lengths))
    t0 = time.perf_counter()
    outs = [beam_fn(params, audio, lengths) for _ in range(iters)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1][1])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _bundle_fixture(batch: int = 32):
    """(params, bench-width audio, sr, meta) for trained-logit decode.

    Prefers the COMMITTED flagship bundle (``BUNDLE_DIR``, exported by
    tools/flagship_accuracy_run.py — VERDICT r3 #4: stop retraining a
    memorization model inside every bench run): restores the bf16-encoded
    checkpoint through the normal restore path and renders
    coarticulated-syllables audio at the bundle's sample rate, tiled to
    the bench clip width.  Falls back to ``_trained_fixture`` when the
    bundle is absent so the *_trained_* keys never silently disappear."""
    import os
    import sys

    bundle = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          BUNDLE_DIR)
    if not os.path.isdir(os.path.join(bundle, "acoustic")):
        params, audio, err = _trained_fixture(batch)
        return params, audio, SR, {
            "trained_fixture_source": "retrained",
            "trained_fixture_error_rate": round(err, 4),
        }

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"
    ))
    import jax
    import jax.numpy as jnp
    import make_demo_corpus as gen

    from rnn_speech_tpu.config import SIDECAR_NAME, Config
    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend
    from rnn_speech_tpu.train import checkpoint
    from rnn_speech_tpu.train.pipeline import PipelineConfig

    with open(os.path.join(bundle, SIDECAR_NAME)) as fh:
        cfg_d = json.load(fh)
    config = Config.from_dict(cfg_d)
    # The bundle trained through the standard pipeline, whose frontend
    # runs at PipelineConfig.sample_rate (the corpus renders at that rate
    # too — flagship_accuracy_run enforces it).
    sr = PipelineConfig(batch_size=1).sample_rate
    fe = DeviceFrontend("fbank", sr=sr, max_samples=int(sr * SECONDS))
    cfg = acoustic.AcousticConfig(
        num_layers=config.num_layers, hidden_size=config.hidden_size,
        input_dim=fe.feature_size, num_labels=LABELS,
        compute_dtype=jnp.bfloat16,
        use_pallas=jax.default_backend() != "cpu",
    )
    template = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    restored = checkpoint.restore(os.path.join(bundle, "acoustic"),
                                  template)
    if restored is None:
        raise RuntimeError(f"bundle at {bundle} has no restorable "
                           "acoustic checkpoint")
    params, step, _ = restored
    # Restored leaves are host numpy arrays; committed once here.  Left
    # as-is, every beam_fn call re-uploads the full 50 MB parameter set
    # through the tunneled device link — measured 585 -> 9 utt/s on the
    # beam16 bench, a transfer artifact, not decode cost.
    params = jax.device_put(params)

    rng = np.random.default_rng(7)
    texts = gen.sample_sentences(batch, rng)
    max_samples = int(sr * SECONDS)
    audio = np.zeros((batch, max_samples), np.float32)
    for b, text in enumerate(texts):
        sig = np.asarray(gen.render_syllables(text, sr, rng),
                         np.float32) / 32768.0
        reps = -(-max_samples // len(sig))
        audio[b] = np.tile(sig, reps)[:max_samples]
    return params, jnp.asarray(audio), sr, {
        "trained_fixture_source": "bundle",
        "trained_fixture_step": step,
    }


def _trained_fixture(batch: int = 32):
    """(trained flagship params, bench-width audio, final train error).

    Trains the 3x1024 stack to memorization on 16 letters-font clips at a
    short sequence (decode cost depends on logit peakedness, not
    generalization; params are shape-independent of T), then tiles the
    rendered audio to the bench width so the trained-decode measurement
    runs at the same T as the random-logits numbers (VERDICT r2 #6)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"
    ))
    import jax
    import jax.numpy as jnp
    import make_demo_corpus as gen

    from rnn_speech_tpu.charmap import CharMap
    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend
    from rnn_speech_tpu.train import step as step_mod
    from rnn_speech_tpu.train.pipeline import PipelineConfig

    rng = np.random.default_rng(7)
    cm = CharMap()
    texts = gen.sample_sentences(16, rng)
    sigs = [
        np.asarray(gen.render_letters(t, SR, rng), np.float32) / 32768.0
        for t in texts
    ]

    T_TRAIN, MAX_LABEL = 500, 60            # letters clips run ~2-5 s
    pcfg = PipelineConfig(batch_size=16, max_input_seq_length=T_TRAIN,
                          max_target_seq_length=MAX_LABEL)
    fe = DeviceFrontend("fbank", sr=SR, max_samples=pcfg.max_samples)
    on_tpu = jax.default_backend() != "cpu"
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=jnp.bfloat16, use_pallas=on_tpu,
    )
    scfg = step_mod.StepConfig(model=cfg, frontend=fe,
                               use_pallas_ctc=on_tpu)
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, 16, 3e-3)

    audio = np.zeros((1, 16, pcfg.max_samples), np.float32)
    alen = np.zeros((1, 16), np.int32)
    labels = np.full((1, 16, MAX_LABEL), -1, np.int32)
    llen = np.zeros((1, 16), np.int32)
    for i, (text, sig) in enumerate(zip(texts, sigs)):
        sig = sig[: pcfg.max_samples]
        audio[0, i, : len(sig)] = sig
        alen[0, i] = len(sig)
        ids, n = cm.encode_padded(text, MAX_LABEL)
        labels[0, i] = ids
        llen[0, i] = n
    batch_d = {
        "audio": jnp.asarray(audio),
        "audio_lengths": jnp.asarray(alen),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.asarray(llen),
    }
    train_fn = jax.jit(step_mod.train_step, static_argnums=0,
                       donate_argnums=(1,))
    key = jax.random.key(0, impl="rbg")
    metrics = None
    for _ in range(200):
        state, metrics = train_fn(scfg, state, batch_d, key,
                                  jnp.asarray(False))
    err = float(metrics["mean_error_rate"])

    bench_audio = np.zeros((batch, MAX_SAMPLES), np.float32)
    for b in range(batch):
        sig = sigs[b % len(sigs)]
        reps = -(-MAX_SAMPLES // len(sig))
        bench_audio[b] = np.tile(sig, reps)[:MAX_SAMPLES]
    import jax.numpy as jnp2

    return state["params"], jnp2.asarray(bench_audio), err


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
    import os
    import sys
    import traceback

    value, eval_spread, _vals = bench_tpu()
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
        "eval_spread_pct": eval_spread,
    }
    peak = _peak_flops()
    if peak:
        eval_frames = int(SECONDS / 0.01)
        result["mfu_eval"] = round(
            value * _stack_flops(eval_frames, 1) / peak, 3
        )
    if not os.environ.get("RST_BENCH_FAST"):
        # Secondary modes are best-effort: a failure there must not lose
        # the primary metric line.
        try:
            result.update(bench_train())
        except Exception:
            traceback.print_exc(file=sys.stderr)
        for key, kw in [
            ("beam8_utt_per_sec", dict(beam_width=8)),
            ("beam16_utt_per_sec", dict(beam_width=16)),
            ("beam8_lm_utt_per_sec", dict(beam_width=8, with_lm=True)),
        ]:
            try:
                result[key] = round(bench_beam(**kw), 3)
            except Exception:
                traceback.print_exc(file=sys.stderr)
        # Decode cost on PEAKED logits: the committed flagship bundle's
        # weights over rendered syllables audio (random-init logits
        # overstate tie/merge pressure); falls back to an in-run
        # memorization train when no bundle is committed.
        try:
            t_params, t_audio, t_sr, t_meta = _bundle_fixture()
            result.update(t_meta)
            for key, kw in [
                ("beam8_trained_utt_per_sec", dict(beam_width=8)),
                ("beam16_trained_utt_per_sec", dict(beam_width=16)),
                ("beam8_lm_trained_utt_per_sec",
                 dict(beam_width=8, with_lm=True)),
            ]:
                result[key] = round(
                    bench_beam(params=t_params, audio=t_audio, sr=t_sr,
                               **kw), 3
                )
        except Exception:
            traceback.print_exc(file=sys.stderr)
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
