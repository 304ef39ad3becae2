#!/usr/bin/env python
"""Per-stage on-chip profile of the flagship training step.

Times each compute stage of the reference-shape train step (3x1024,
T=3510, fbank-120, B=64) in isolation on the real TPU, plus fused-vs-XLA
A/B variants of the stages this repo replaced with Pallas kernels
(weight-gradient contraction, dropout, CTC).  Methodology notes:

* Every timed function RETURNS its full output arrays (timing waits on
  ``jax.block_until_ready``).  Reducing outputs with ``.sum()`` for
  timing is unsound: XLA's algebraic simplifier rewrites
  ``einsum(a, b).sum()`` into factored column-sum forms and the
  measurement stops covering the matmul at all.
* Each timing runs one compile + warmup call, then ITER steady-state
  iterations.

Run from the repo root on a TPU host:
    python tools/profile_step.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS, HIDDEN, LABELS = 3, 1024, 80
T_FRAMES, MAX_LABEL, B = 3510, 600, 64
ITER = 5


def _timeit(name, fn, *args, results=None):
    """Slope timing: (t(N2) - t(N1)) / (N2 - N1) cancels the per-batch
    fixed costs a tunneled backend adds (dispatch round-trips and the
    proof-of-completion fetch), which at 5 iterations inflate sub-50 ms
    stages by several ms each.  The fetch transfers ONE leaf element —
    np.asarray on a whole leaf would ship it through the tunnel."""
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops import lstm_pallas
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend
    from rnn_speech_tpu.train import step as step_mod
    from rnn_speech_tpu.train.pipeline import PipelineConfig

    results = {}
    bf = jnp.bfloat16
    pcfg = PipelineConfig(batch_size=B, max_input_seq_length=T_FRAMES,
                          max_target_seq_length=MAX_LABEL)
    fe = DeviceFrontend("fbank", sr=pcfg.sample_rate,
                        max_samples=pcfg.max_samples)
    cfg = acoustic.AcousticConfig(
        num_layers=LAYERS, hidden_size=HIDDEN, input_dim=fe.feature_size,
        num_labels=LABELS, compute_dtype=bf, use_pallas=True,
    )
    scfg = step_mod.StepConfig(model=cfg, frontend=fe, use_pallas_ctc=True)
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, B, 3e-4)
    rng = np.random.default_rng(1)
    batch = {
        "audio": jnp.asarray(
            rng.normal(0, 0.1, (1, B, pcfg.max_samples)).astype(np.float32)),
        "audio_lengths": jnp.full((1, B), pcfg.max_samples, jnp.int32),
        "labels": jnp.asarray(
            rng.integers(1, LABELS - 1, (1, B, MAX_LABEL)).astype(np.int32)),
        "label_lengths": jnp.full((1, B), 250, jnp.int32),
    }
    key = jax.random.key(0, impl="rbg")
    no_reset = jnp.asarray(False)

    # 1. the full train step and the eval step
    train_fn = jax.jit(step_mod.train_step, static_argnums=0)
    _timeit("full train step", lambda: train_fn(scfg, state, batch, key,
                                                no_reset), results=results)
    T = T_FRAMES
    feats = jnp.asarray(rng.normal(0, 0.5, (T, B, fe.feature_size))
                        .astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)

    # 2. frontend
    from rnn_speech_tpu.ops import frontend_jax
    _timeit("frontend featurize", jax.jit(
        lambda a, n: frontend_jax.featurize(fe, a, n)),
        batch["audio"][0], batch["audio_lengths"][0], results=results)

    # 3. per-layer recurrence fwd (train residuals) + bwd kernel + wgrads
    from rnn_speech_tpu.ops.grad_matmul_pallas import dgates_weight_grads
    for name, D in (("L0 (D->H)", fe.feature_size), ("L1/L2 (H->H)", HIDDEN)):
        x = jnp.asarray(rng.normal(0, 0.5, (T, B, D)).astype(np.float32))
        w_x = jnp.asarray(rng.normal(0, 0.02, (D, 4 * HIDDEN))
                          .astype(np.float32))
        w_h = jnp.asarray(rng.normal(0, 0.02, (HIDDEN, 4 * HIDDEN))
                          .astype(np.float32))
        b = jnp.zeros((4 * HIDDEN,), jnp.float32)
        h0 = jnp.zeros((B, HIDDEN), jnp.float32)
        mask = jnp.ones((T, 1, B), jnp.float32)

        xp = _timeit(f"xproj matmul {name}", jax.jit(
            lambda x, w, b: jnp.dot(x.astype(bf), w.astype(bf),
                                    preferred_element_type=jnp.float32)
            + b), x, w_x, b, results=results)
        fwd = _timeit(f"fwd recurrence (train residuals) {name}", jax.jit(
            lambda xp, wh: lstm_pallas._lstm_recurrence_train(
                xp, wh.astype(bf), mask, h0, h0, bf)),
            xp, w_h, results=results)
        out, _hn, _cn, gates_act, c_seq = fwd
        dout = jnp.asarray(rng.normal(0, 0.1, (T, B, HIDDEN))
                           .astype(np.float32))
        c_prev = jnp.concatenate([h0.astype(bf)[None], c_seq[:-1]], axis=0)
        dgates = _timeit(f"bwd recurrence kernel {name}", jax.jit(
            lambda dout, ga, cs, cp, wh: lstm_pallas._lstm_recurrence_bwd(
                dout, ga, cs, cp, mask, wh.astype(bf), h0, h0)),
            dout, gates_act, c_seq, c_prev, w_h, results=results)[0]
        h_prev = jnp.concatenate([h0[None], out[:-1]], axis=0)

        _timeit(f"fused wgrad kernel {name}", jax.jit(
            lambda h, x, dg: dgates_weight_grads(h, x, dg)),
            h_prev, x, dgates, results=results)

        def einsum_wgrads(h, x, dg):
            dgc = dg.astype(bf)
            dwh = jnp.einsum("tbh,tbg->hg", h.astype(bf), dgc,
                             preferred_element_type=jnp.float32)
            dwx = jnp.einsum("tbd,tbg->dg", x.astype(bf), dgc,
                             preferred_element_type=jnp.float32)
            db = jnp.sum(dg, axis=(0, 1), dtype=jnp.float32)
            return dwh, dwx, db
        _timeit(f"einsum wgrads {name}", jax.jit(einsum_wgrads),
                h_prev, x, dgates, results=results)
        _timeit(f"dx matmul {name}", jax.jit(
            lambda dg, wx: jnp.einsum(
                "tbg,dg->tbd", dg.astype(bf), wx.astype(bf),
                preferred_element_type=jnp.float32)),
            dgates, w_x, results=results)
        # Free this layer's activations before the next one allocates its
        # own (~11 GB of (T, B, 4H) streams per layer — two layers' worth
        # does not fit HBM side by side).
        del x, xp, fwd, out, gates_act, c_seq, c_prev, dout, dgates, h_prev

    # 4. CTC value and value+grad (blocked kernels)
    from rnn_speech_tpu.ops import ctc_pallas
    logits = jnp.asarray(rng.normal(0, 1.0, (T, B, LABELS))
                         .astype(np.float32))
    labels = batch["labels"][0]
    lab_len = batch["label_lengths"][0]
    _timeit("CTC value only (pallas, blocked)", jax.jit(
        lambda lg: ctc_pallas.ctc_loss(lg, lens, labels, lab_len)),
        logits, results=results)
    _timeit("CTC value+grad (pallas, blocked)", jax.jit(jax.value_and_grad(
        lambda lg: jnp.sum(ctc_pallas.ctc_loss(lg, lens, labels, lab_len)))),
        logits, results=results)

    # 5. dropout: fused in-kernel-PRNG vs bernoulli, 2 sites over (T, B, H)
    from rnn_speech_tpu.ops.dropout_pallas import dropout_pallas
    big = jnp.asarray(rng.normal(0, 1.0, (T, B, HIDDEN)).astype(np.float32))
    k2 = jax.random.PRNGKey(0)
    _timeit("dropout fused 2-mask site (T,B,H)", jax.jit(
        lambda x, k: dropout_pallas(k, x, [0.8, 0.5])),
        big, k2, results=results)

    def bern2(x, k):
        for p in (0.8, 0.5):
            k, s = jax.random.split(k)
            m = jax.random.bernoulli(s, p, x.shape)
            x = jnp.where(m, x / p, 0.0)
        return x
    _timeit("dropout bernoulli 2 sites (T,B,H)", jax.jit(bern2),
            big, key, results=results)

    # 6. output projection fwd+bwd: fused _dense vs plain dot
    hid = jnp.asarray(rng.normal(0, 0.5, (T, B, HIDDEN)).astype(np.float32))
    w_o = jnp.asarray(rng.normal(0, 0.02, (HIDDEN, LABELS))
                      .astype(np.float32))
    b_o = jnp.zeros((LABELS,), jnp.float32)
    co = jnp.asarray(rng.normal(0, 0.1, (T, B, LABELS)).astype(np.float32))

    def vjp_of(f):
        def run(h, w, b):
            y, pull = jax.vjp(lambda *a: f(*a), h, w, b)
            return y, pull(co)
        return run
    _timeit("output proj fwd+bwd (fused _dense)", jax.jit(
        vjp_of(lambda h, w, b: acoustic._dense(h, w, b, bf))),
        hid, w_o, b_o, results=results)
    _timeit("output proj fwd+bwd (plain dot)", jax.jit(
        vjp_of(lambda h, w, b: jnp.dot(
            h.astype(bf), w.astype(bf),
            preferred_element_type=jnp.float32) + b)),
        hid, w_o, b_o, results=results)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
