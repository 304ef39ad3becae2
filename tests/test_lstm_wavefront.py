"""Wavefront stack kernel vs the layered scan path (exact schedule-only
difference: the diagonal walk must be bit-for-bit equivalent math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_speech_tpu.ops import lstm
from rnn_speech_tpu.ops.lstm_wavefront import lstm_stack_wavefront_apply


def _stack_scan(layers, x, lengths, states):
    outs = x
    new_states = []
    for params, st in zip(layers, states):
        outs, st = lstm.lstm_layer_scan(params, outs, lengths, st)
        new_states.append(st)
    return outs, new_states


@pytest.mark.parametrize("lengths", [
    [12, 7, 1, 12],
    [3, 0, 12, 5],
])
def test_wavefront_matches_layered_scan(lengths):
    T, B, D, H, L = 12, 4, 6, 8, 3
    key = jax.random.PRNGKey(0)
    layers = lstm.init_lstm_stack(key, L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D), jnp.float32)
    states = [
        (jax.random.normal(jax.random.PRNGKey(10 + i), (B, H)) * 0.1,
         jax.random.normal(jax.random.PRNGKey(20 + i), (B, H)) * 0.1)
        for i in range(L)
    ]
    lengths = jnp.asarray(lengths, jnp.int32)

    ref_out, ref_states = _stack_scan(layers, x, lengths, states)
    out, new_states = lstm_stack_wavefront_apply(
        layers, x, lengths, states, interpret=True
    )

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    for (c, h), (rc, rh) in zip(new_states, ref_states):
        np.testing.assert_allclose(np.asarray(c), np.asarray(rc),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), np.asarray(rh),
                                   rtol=1e-5, atol=1e-5)


def _ref_stack_dropped(layers, x, lengths, states, drop_masks):
    """Pure-scan reference: explicit inter-layer scale-mask dropout."""
    out = x
    new_states = []
    for l, (params, st) in enumerate(zip(layers, states)):
        if l > 0 and drop_masks is not None:
            out = out * drop_masks[l - 1]
        out, st = lstm.lstm_layer_scan(params, out, lengths, st)
        new_states.append(st)
    return out, new_states


@pytest.mark.parametrize("bwd_wavefront", ["1", "0"])
@pytest.mark.parametrize("with_drop", [False, True])
def test_wavefront_train_grads_match_scan(with_drop, bwd_wavefront,
                                          monkeypatch):
    """The custom-VJP train path == autodiff through the scan stack,
    values AND gradients (f32 residuals for exactness), including the
    inter-layer dropout scale masks — for BOTH backward schedules (the
    fused reverse diagonal and the layered per-layer fallback)."""
    monkeypatch.setenv("RST_WAVEFRONT_BWD", bwd_wavefront)
    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops.lstm_wavefront import lstm_stack_wavefront_train

    T, B, D, H, L = 10, 4, 6, 8, 3
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(0), L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D), jnp.float32)
    states = [
        (jax.random.normal(jax.random.PRNGKey(10 + i), (B, H)) * 0.1,
         jax.random.normal(jax.random.PRNGKey(20 + i), (B, H)) * 0.1)
        for i in range(L)
    ]
    lengths = jnp.asarray([10, 7, 1, 9], jnp.int32)
    drop_masks = None
    if with_drop:
        keep = 0.8
        bern = jax.random.bernoulli(
            jax.random.PRNGKey(5), keep, (L - 1, T, B, H)
        )
        drop_masks = bern.astype(jnp.float32) / keep
    cot = jax.random.normal(jax.random.PRNGKey(3), (T, B, H))

    def loss_ref(layers, x, states):
        out, new_states = _ref_stack_dropped(
            layers, x, lengths, states, drop_masks
        )
        return (
            jnp.sum(out * cot)
            + sum(jnp.sum(c) * 0.3 + jnp.sum(h) * 0.7
                  for c, h in new_states)
        )

    def loss_wave(layers, x, states):
        out, new_states = lstm_stack_wavefront_train(
            layers, x, lengths, states, drop_masks=drop_masks,
            residual_dtype=jnp.float32,
        )
        return (
            jnp.sum(out * cot)
            + sum(jnp.sum(c) * 0.3 + jnp.sum(h) * 0.7
                  for c, h in new_states)
        )

    ref_val, ref_grads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        layers, x, states
    )
    with pltpu.force_tpu_interpret_mode():
        wav_val, wav_grads = jax.value_and_grad(
            loss_wave, argnums=(0, 1, 2)
        )(layers, x, states)

    np.testing.assert_allclose(float(wav_val), float(ref_val),
                               rtol=1e-5, atol=1e-5)
    for r, w in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(wav_grads)):
        np.testing.assert_allclose(np.asarray(w), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_lstm_stack_wavefront_branch_matches_layered():
    """lstm_stack(wavefront=True) == the layered pallas path, inference
    and training-gradient (dropout off), through the public stack API."""
    from jax.experimental.pallas import tpu as pltpu

    T, B, D, H, L = 11, 4, 6, 8, 3
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(2), L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, D), jnp.float32)
    states = lstm.zero_state(L, B, H)
    lengths = jnp.asarray([11, 8, 3, 11], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out_w, st_w = lstm.lstm_stack(
            layers, x, lengths, states, use_pallas=True, wavefront=True
        )
        out_l, st_l = lstm.lstm_stack(
            layers, x, lengths, states, use_pallas=True, wavefront=False
        )
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_l),
                               rtol=1e-5, atol=1e-5)

    def loss(wavefront):
        def f(layers):
            out, _ = lstm.lstm_stack(
                layers, x, lengths, states, use_pallas=True,
                wavefront=wavefront,
                dropout_rng=jax.random.PRNGKey(9),
            )
            return jnp.sum(out ** 2)
        return f

    with pltpu.force_tpu_interpret_mode():
        g_w = jax.grad(loss(True))(layers)
        g_l = jax.grad(loss(False))(layers)
    for a, b in zip(jax.tree_util.tree_leaves(g_w),
                    jax.tree_util.tree_leaves(g_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_lstm_stack_wavefront_dropout_smoke():
    """With real keep probs the wavefront train path runs under grad and
    keeps the kept-unit expectation (scale masks sum to ~1 in mean)."""
    from jax.experimental.pallas import tpu as pltpu

    T, B, D, H, L = 12, 8, 6, 8, 2
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(6), L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(7), (T, B, D), jnp.float32)
    states = lstm.zero_state(L, B, H)
    lengths = jnp.full((B,), T, jnp.int32)

    def f(layers):
        out, _ = lstm.lstm_stack(
            layers, x, lengths, states, use_pallas=True, wavefront=True,
            dropout_rng=jax.random.PRNGKey(8),
            input_keep_prob=0.9, output_keep_prob=0.6,
        )
        return jnp.sum(out ** 2)

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(f)(layers)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_wavefront_two_layers():
    """L=2 exercises the (L-1)-sized W_x/bias stacking edge."""
    T, B, D, H, L = 9, 2, 5, 4, 2
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(3), L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, D), jnp.float32)
    states = lstm.zero_state(L, B, H)
    lengths = jnp.asarray([9, 6], jnp.int32)
    ref_out, ref_states = _stack_scan(layers, x, lengths, states)
    out, new_states = lstm_stack_wavefront_apply(
        layers, x, lengths, states, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    for (c, h), (rc, rh) in zip(new_states, ref_states):
        np.testing.assert_allclose(np.asarray(c), np.asarray(rc),
                                   rtol=1e-5, atol=1e-5)


def test_seed_mode_vjp_matches_directional_fd():
    """Seed-mode dropout (in-kernel PRNG regeneration, fused boundary
    dW_x accumulation) has no explicit-mask twin to compare against —
    the bits live only inside the kernels.  But given a fixed seed the
    whole train path is a deterministic differentiable function, so the
    custom VJP must match a central finite difference along a random
    direction.  f32 residuals for exactness; covers the fused
    dW_x-in-kernel path (drop_mode=2) end to end."""
    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops.lstm_wavefront import lstm_stack_wavefront_train

    T, B, D, H, L = 8, 4, 6, 8, 3
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(0), L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D), jnp.float32)
    states = lstm.zero_state(L, B, H)
    lengths = jnp.asarray([8, 5, 8, 2], jnp.int32)
    seed = jnp.asarray([123, -456], jnp.int32)
    cot = jax.random.normal(jax.random.PRNGKey(3), (T, B, H))

    def f(layers):
        out, _ = lstm_stack_wavefront_train(
            layers, x, lengths, states, drop_seed=seed, drop_keep=0.75,
            residual_dtype=jnp.float32,
        )
        return jnp.sum(out * cot)

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(f)(layers)
        assert np.isfinite(float(val))
        v = [
            {k: jax.random.normal(jax.random.PRNGKey(hash(k) % 1000 + i),
                                  p[k].shape)
             for k in p}
            for i, p in enumerate(layers)
        ]
        eps = 1e-3
        shift = lambda s: [
            {k: p[k] + s * v[i][k] for k in p}
            for i, p in enumerate(layers)
        ]
        fd = (f(shift(eps)) - f(shift(-eps))) / (2 * eps)
    analytic = sum(
        float(jnp.vdot(grads[i][k], v[i][k]))
        for i in range(L) for k in layers[0]
    )
    np.testing.assert_allclose(analytic, float(fd), rtol=5e-3, atol=5e-3)
