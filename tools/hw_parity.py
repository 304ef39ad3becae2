#!/usr/bin/env python
"""On-hardware numerics check: Pallas kernels vs scan paths on a real TPU.

The pytest suite runs kernels in interpret mode on CPU; this script runs
the same parity checks on the actual chip, where DEFAULT-precision f32
matmuls round operands to bf16 on the MXU.  The acceptance criterion is
therefore *relative to the platform's own noise floor*: the Pallas and
scan paths must agree with each other far more tightly than either agrees
with a CPU reference (both share the MXU rounding; a kernel bug would
break their mutual agreement first).

Run from the repo root on a TPU host:  python tools/hw_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check_lstm() -> None:
    from rnn_speech_tpu.ops import lstm, lstm_pallas

    T, B, D, H = 96, 8, 16, 256
    key = jax.random.PRNGKey(0)
    layers = lstm.init_lstm_stack(key, 1, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    lens = jnp.asarray([96, 50, 0, 96, 31, 96, 7, 96], jnp.int32)
    state = (jnp.zeros((B, H)) + 0.2, jnp.zeros((B, H)) - 0.1)
    wy = jax.random.normal(jax.random.PRNGKey(2), (T, B, H)) * 0.1

    def loss(fn):
        def inner(params, xx, st):
            ys, (c, h) = fn(params, xx, lens, st)
            return jnp.sum(ys * wy) + jnp.sum(c ** 2) + jnp.sum(jnp.abs(h))
        return inner

    ref = jax.jit(jax.grad(loss(lstm.lstm_layer_scan), argnums=(0, 1, 2)))(
        layers[0], x, state)
    pal = jax.jit(jax.grad(loss(lstm_pallas.lstm_layer_pallas),
                           argnums=(0, 1, 2)))(layers[0], x, state)
    for r, p in zip(jax.tree.leaves(ref), jax.tree.leaves(pal)):
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        rel = float(jnp.max(jnp.abs(r - p))) / scale
        assert rel < 2e-2, f"LSTM grad rel diff {rel:.3e} (scale {scale:.2e})"
    y1, _ = jax.jit(lambda p, xx, st: lstm.lstm_layer_scan(p, xx, lens, st))(
        layers[0], x, state)
    y2, _ = jax.jit(lambda p, xx, st: lstm_pallas.lstm_layer_pallas(
        p, xx, lens, st))(layers[0], x, state)
    diff = float(jnp.max(jnp.abs(y1 - y2)))
    assert diff < 1e-3, f"LSTM fwd diff {diff:.3e}"
    print("LSTM pallas-vs-scan on hardware: OK")

    # Recompute-residual backward (cell-sequence-only residuals, gates
    # rebuilt in-kernel): same gradients within the platform noise floor.
    import functools

    rec = jax.jit(jax.grad(loss(functools.partial(
        lstm_pallas.lstm_layer_pallas, residual_mode="recompute"
    )), argnums=(0, 1, 2)))(layers[0], x, state)
    for r, p in zip(jax.tree.leaves(ref), jax.tree.leaves(rec)):
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        rel = float(jnp.max(jnp.abs(r - p))) / scale
        assert rel < 2e-2, \
            f"LSTM recompute grad rel diff {rel:.3e} (scale {scale:.2e})"
    print("LSTM recompute-mode backward on hardware: OK")


def check_wavefront() -> None:
    """Cross-layer wavefront stack (fwd diagonal + fused reverse-diagonal
    backward) vs the layered scan stack, values AND gradients, on the
    actual chip (interpret-mode coverage lives in
    tests/test_lstm_wavefront.py)."""
    import os

    from rnn_speech_tpu.ops import lstm
    from rnn_speech_tpu.ops.lstm_wavefront import (
        lstm_stack_wavefront_apply, lstm_stack_wavefront_train,
    )

    T, B, D, H, L = 64, 8, 128, 128, 3
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(0), L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    lens = jnp.asarray([64, 50, 0, 64, 31, 64, 7, 13], jnp.int32)
    states = [
        (jax.random.normal(jax.random.PRNGKey(10 + i), (B, H)) * 0.1,
         jax.random.normal(jax.random.PRNGKey(20 + i), (B, H)) * 0.1)
        for i in range(L)
    ]
    wy = jax.random.normal(jax.random.PRNGKey(2), (T, B, H)) * 0.1

    def ref_stack(params_list, xx, sts):
        out = xx
        new = []
        for p, st in zip(params_list, sts):
            out, st = lstm.lstm_layer_scan(p, out, lens, st)
            new.append(st)
        return out, new

    def loss(fn):
        def inner(params_list, xx, sts):
            ys, new = fn(params_list, xx, sts)
            return (jnp.sum(ys * wy)
                    + sum(jnp.sum(c) * 0.3 + jnp.sum(h) * 0.7
                          for c, h in new))
        return inner

    ref = jax.jit(jax.grad(loss(ref_stack), argnums=(0, 1, 2)))(
        layers, x, states)
    wave_fn = lambda p, xx, sts: lstm_stack_wavefront_train(
        p, xx, lens, sts, residual_dtype=jnp.float32)
    for flag in ("1", "0"):
        os.environ["RST_WAVEFRONT_BWD"] = flag
        wav = jax.jit(jax.grad(loss(wave_fn), argnums=(0, 1, 2)))(
            layers, x, states)
        for r, p in zip(jax.tree.leaves(ref), jax.tree.leaves(wav)):
            scale = float(jnp.max(jnp.abs(r))) + 1e-6
            rel = float(jnp.max(jnp.abs(r - p))) / scale
            assert rel < 2e-2, \
                f"wavefront(bwd={flag}) grad rel diff {rel:.3e}"
        jax.clear_caches()   # distinct compiles per env flag
    os.environ.pop("RST_WAVEFRONT_BWD", None)
    y_ref, _ = jax.jit(ref_stack)(layers, x, states)
    y_app, _ = jax.jit(lambda p, xx, sts: lstm_stack_wavefront_apply(
        p, xx, lens, sts))(layers, x, states)
    diff = float(jnp.max(jnp.abs(y_ref - y_app)))
    assert diff < 1e-3, f"wavefront apply fwd diff {diff:.3e}"
    print("cross-layer wavefront stack (fwd + fused bwd) on hardware: OK")


def check_ctc() -> None:
    from rnn_speech_tpu.ops import ctc, ctc_pallas

    T, B, V, L = 640, 6, 80, 120
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (T, B, V)).astype(np.float32))
    ll = jnp.asarray([640, 300, 640, 50, 0, 640], jnp.int32)
    labels = jnp.asarray(rng.integers(0, 78, (B, L)).astype(np.int32))
    lab_len = jnp.asarray([120, 60, 30, 10, 5, 119], jnp.int32)

    l_s = jax.jit(lambda lg: ctc.ctc_loss(lg, ll, labels, lab_len))(logits)
    l_p = jax.jit(lambda lg: ctc_pallas.ctc_loss(lg, ll, labels, lab_len))(logits)
    rel = float(jnp.max(jnp.abs(l_s - l_p) / jnp.maximum(jnp.abs(l_s), 1.0)))
    assert rel < 5e-4, f"CTC loss rel diff {rel:.3e}"

    g_s = jax.jit(jax.grad(lambda lg: jnp.sum(
        ctc.ctc_loss(lg, ll, labels, lab_len))))(logits)
    g_p = jax.jit(jax.grad(lambda lg: jnp.sum(
        ctc_pallas.ctc_loss(lg, ll, labels, lab_len))))(logits)
    diff = float(jnp.max(jnp.abs(g_s - g_p)))
    assert diff < 5e-2, f"CTC grad diff {diff:.3e}"
    print("CTC pallas-vs-scan on hardware: OK")


def check_frontend() -> None:
    """Fused Pallas fbank kernel vs the XLA view-matmul path on the chip
    (the pytest parity runs the kernel in interpret mode on CPU only)."""
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    sr = 22050
    max_samples = sr * 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 0.2, (4, max_samples)).astype(np.float32))
    lens = jnp.asarray(
        [max_samples, max_samples // 2, max_samples // 3, 1000], jnp.int32
    )
    fe_x = DeviceFrontend("fbank", sr=sr, max_samples=max_samples,
                          use_pallas=False)
    fe_p = DeviceFrontend("fbank", sr=sr, max_samples=max_samples,
                          use_pallas=True)
    feats_x, nf_x = jax.jit(fe_x)(x, lens)
    feats_p, nf_p = jax.jit(fe_p)(x, lens)
    assert np.array_equal(np.asarray(nf_x), np.asarray(nf_p))
    scale = max(1.0, float(jnp.max(jnp.abs(feats_x))))
    diff = float(jnp.max(jnp.abs(feats_x - feats_p))) / scale
    assert diff < 5e-3, f"frontend fbank rel diff {diff:.3e}"
    print("frontend pallas-vs-xla on hardware: OK")


def check_beam() -> None:
    """On-device prefix beam search vs a host dict-based oracle — the CPU
    tests pin this in f32; on the chip the scan carries round differently,
    so confirm the top hypothesis and its score survive real numerics."""
    import math

    def host_prefix_beam_search(log_probs, beam_width, blank):
        T, V = log_probs.shape
        beams = {(): (0.0, -np.inf)}
        for t in range(T):
            new = {}

            def add(prefix, pb, pnb):
                opb, opnb = new.get(prefix, (-np.inf, -np.inf))
                new[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

            for prefix, (pb, pnb) in beams.items():
                total = np.logaddexp(pb, pnb)
                add(prefix, total + log_probs[t, blank], -np.inf)
                if prefix:
                    add(prefix, -np.inf, pnb + log_probs[t, prefix[-1]])
                for c in range(V):
                    if c == blank:
                        continue
                    p_base = pb if (prefix and c == prefix[-1]) else total
                    add(prefix + (c,), -np.inf, p_base + log_probs[t, c])
            beams = dict(sorted(new.items(),
                                key=lambda kv: -np.logaddexp(*kv[1]))[:beam_width])
        return sorted(((list(k), np.logaddexp(*v)) for k, v in beams.items()),
                      key=lambda kv: -kv[1])

    from rnn_speech_tpu.ops import decode

    T, B, V, K = 60, 3, 10, 8
    rng = np.random.default_rng(5)
    logits = rng.normal(0, 2, (T, B, V)).astype(np.float32)
    ll = jnp.asarray([60, 37, 60], jnp.int32)
    labels, lengths, scores = jax.jit(
        lambda lg: decode.beam_search_decode(lg, ll, beam_width=K)
    )(jnp.asarray(logits))
    for b in range(B):
        lp = jax.nn.log_softmax(jnp.asarray(logits[:, b]), axis=-1)
        oracle = host_prefix_beam_search(np.asarray(lp)[: int(ll[b])], K,
                                         blank=V - 1)
        got = list(np.asarray(labels)[b, 0, : int(lengths[b, 0])])
        assert got == oracle[0][0], (b, got, oracle[0][0])
        assert math.isclose(float(scores[b, 0]), oracle[0][1],
                            rel_tol=0, abs_tol=2e-2), (
            b, float(scores[b, 0]), oracle[0][1])
    print("beam search vs host oracle on hardware: OK")


def check_dropout() -> None:
    """Statistical properties of the fused in-kernel-PRNG dropout that the
    CPU interpret mode cannot see (its PRNG stub yields all-zero bits):
    keep fraction, unbiasedness, key sensitivity, and the backward's
    regenerated mask matching the forward's zero pattern exactly."""
    from rnn_speech_tpu.ops.dropout_pallas import dropout_pallas

    x = jnp.ones((2000, 1024), jnp.float32) * 2.0
    key = jax.random.PRNGKey(42)
    out = np.asarray(dropout_pallas(key, x, [0.8]))
    keep_frac = (out != 0).mean()
    assert abs(keep_frac - 0.8) < 0.005, keep_frac
    assert abs(out.mean() - 2.0) < 0.02, out.mean()
    assert set(np.unique(out)) <= {0.0, np.float32(2.0 / 0.8)}, "support"

    out_b = np.asarray(dropout_pallas(jax.random.PRNGKey(43), x, [0.8]))
    assert (out != out_b).mean() > 0.2, "masks must differ across keys"

    # two fused masks compose: keep fraction ~ k1*k2
    out2 = np.asarray(dropout_pallas(key, x, [0.8, 0.5]))
    assert abs((out2 != 0).mean() - 0.4) < 0.005

    # backward regenerates the identical mask
    g = np.asarray(jax.grad(
        lambda v: dropout_pallas(key, v, [0.8]).sum())(x))
    np.testing.assert_array_equal(g != 0, out != 0)
    print("fused dropout statistics + VJP mask identity on hardware: OK")


def check_grad_matmul() -> None:
    """Fused dW/db contraction vs the einsum forms on hardware (bf16
    operands, f32 accumulation on both sides)."""
    from rnn_speech_tpu.ops.grad_matmul_pallas import dgates_weight_grads

    T, B, H, D, G = 96, 8, 256, 120, 1024
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    h = jax.random.normal(ks[0], (T, B, H), jnp.float32)
    x = jax.random.normal(ks[1], (T, B, D), jnp.float32)
    dg = jax.random.normal(ks[2], (T, B, G), jnp.float32)
    dwh, dwx, db = jax.jit(dgates_weight_grads)(h, x, dg)
    bf = jnp.bfloat16
    rwh = jnp.einsum("tbh,tbg->hg", h.astype(bf), dg.astype(bf),
                     preferred_element_type=jnp.float32)
    rwx = jnp.einsum("tbd,tbg->dg", x.astype(bf), dg.astype(bf),
                     preferred_element_type=jnp.float32)
    rdb = jnp.sum(dg, axis=(0, 1), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dwh), np.asarray(rwh),
                               rtol=3e-2, atol=3e-1)
    np.testing.assert_allclose(np.asarray(dwx), np.asarray(rwx),
                               rtol=3e-2, atol=3e-1)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rdb),
                               rtol=1e-3, atol=1e-2)
    print("fused weight-grad contraction vs einsums on hardware: OK")


def main() -> int:
    print(f"devices: {jax.devices()}")
    check_lstm()
    check_wavefront()
    check_ctc()
    check_frontend()
    check_beam()
    check_dropout()
    check_grad_matmul()
    print("ALL HARDWARE PARITY CHECKS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
