"""LSTM stack tests: numpy-reference parity, masking, state carry, Pallas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_speech_tpu.ops import lstm


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_lstm_layer(params, x, seq_lengths, c0, h0):
    """Step-by-step reference with BasicLSTMCell dynamics."""
    w_x = np.asarray(params["w_x"], np.float64)
    w_h = np.asarray(params["w_h"], np.float64)
    b = np.asarray(params["b"], np.float64)
    T, B, _ = x.shape
    H = w_h.shape[0]
    c, h = np.asarray(c0, np.float64), np.asarray(h0, np.float64)
    ys = np.zeros((T, B, H))
    for t in range(T):
        gates = x[t] @ w_x + h @ w_h + b
        i, g, f, o = np.split(gates, 4, axis=-1)
        c_new = _sigmoid(f + 1.0) * c + _sigmoid(i) * np.tanh(g)
        h_new = _sigmoid(o) * np.tanh(c_new)
        m = (t < seq_lengths)[:, None]
        c = np.where(m, c_new, c)
        h = np.where(m, h_new, h)
        ys[t] = np.where(m, h_new, 0.0)
    return ys, (c, h)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    T, B, D, H = 12, 3, 5, 8
    layers = lstm.init_lstm_stack(key, 2, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    seq_lengths = jnp.array([12, 7, 0])
    return layers, x, seq_lengths, (T, B, D, H)


def test_scan_matches_numpy(setup):
    layers, x, seq_lengths, (T, B, D, H) = setup
    state = lstm.zero_state(1, B, H)[0]
    ys, (c, h) = lstm.lstm_layer_scan(layers[0], x, seq_lengths, state)
    ys_np, (c_np, h_np) = numpy_lstm_layer(
        layers[0], np.asarray(x), np.asarray(seq_lengths), *state
    )
    np.testing.assert_allclose(ys, ys_np, atol=1e-5)
    np.testing.assert_allclose(c, c_np, atol=1e-5)
    np.testing.assert_allclose(h, h_np, atol=1e-5)


def test_masking_freezes_state(setup):
    layers, x, seq_lengths, (T, B, D, H) = setup
    state = lstm.zero_state(1, B, H)[0]
    ys, (c, h) = lstm.lstm_layer_scan(layers[0], x, seq_lengths, state)
    # Example 1 has length 7: outputs at t>=7 are zero.
    assert np.all(np.asarray(ys)[7:, 1, :] == 0.0)
    # Example 2 has length 0: state stays exactly zero.
    assert np.all(np.asarray(c)[2] == 0.0) and np.all(np.asarray(h)[2] == 0.0)
    # Frozen state equals state at t=7 of an unmasked shorter run.
    ys2, (c2, h2) = lstm.lstm_layer_scan(
        layers[0], x[:7], jnp.array([7, 7, 7]), lstm.zero_state(1, B, H)[0]
    )
    np.testing.assert_allclose(c[1], c2[1], atol=1e-6)
    np.testing.assert_allclose(h[1], h2[1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys)[:7, 1], np.asarray(ys2)[:, 1],
                               atol=1e-6)


def test_stack_carried_state_continuity(setup):
    """Two chunked runs with carried state == one run over the full seq."""
    layers, x, _, (T, B, D, H) = setup
    full_len = jnp.array([T] * B)
    states = lstm.zero_state(2, B, H)
    y_full, _ = lstm.lstm_stack(layers, x, full_len, states)

    half = T // 2
    y1, mid = lstm.lstm_stack(layers, x[:half], jnp.array([half] * B), states)
    y2, _ = lstm.lstm_stack(layers, x[half:], jnp.array([T - half] * B), mid)
    np.testing.assert_allclose(
        np.concatenate([y1, y2]), np.asarray(y_full), atol=1e-5
    )


def test_stack_shapes_and_state_count(setup):
    layers, x, seq_lengths, (T, B, D, H) = setup
    states = lstm.zero_state(2, B, H)
    ys, new_states = lstm.lstm_stack(layers, x, seq_lengths, states)
    assert ys.shape == (T, B, H)
    assert len(new_states) == 2
    assert new_states[0][0].shape == (B, H)


def test_dropout_applied_only_with_rng(setup):
    layers, x, seq_lengths, (T, B, D, H) = setup
    states = lstm.zero_state(2, B, H)
    y_ref, _ = lstm.lstm_stack(layers, x, seq_lengths, states)
    y_nodrop, _ = lstm.lstm_stack(
        layers, x, seq_lengths, states, dropout_rng=None,
        input_keep_prob=0.5, output_keep_prob=0.5,
    )
    np.testing.assert_allclose(y_ref, y_nodrop, atol=1e-7)
    y_drop, _ = lstm.lstm_stack(
        layers, x, seq_lengths, states, dropout_rng=jax.random.PRNGKey(3),
        input_keep_prob=0.5, output_keep_prob=0.5,
    )
    assert not np.allclose(np.asarray(y_ref), np.asarray(y_drop))


def test_bf16_compute_close_to_f32(setup):
    layers, x, seq_lengths, (T, B, D, H) = setup
    states = lstm.zero_state(2, B, H)
    y32, _ = lstm.lstm_stack(layers, x, seq_lengths, states)
    y16, _ = lstm.lstm_stack(
        layers, x, seq_lengths, states, compute_dtype=jnp.bfloat16
    )
    np.testing.assert_allclose(np.asarray(y32), np.asarray(y16), atol=0.05)


def test_grad_flows_through_scan(setup):
    layers, x, seq_lengths, (T, B, D, H) = setup
    states = lstm.zero_state(2, B, H)

    def loss(ls):
        ys, _ = lstm.lstm_stack(ls, x, seq_lengths, states)
        return jnp.sum(ys ** 2)

    grads = jax.grad(loss)(layers)
    assert np.isfinite(np.asarray(grads[0]["w_h"])).all()
    assert np.abs(np.asarray(grads[0]["w_x"])).max() > 0


def test_pallas_matches_scan(setup):
    """Pallas recurrence (interpret mode on CPU) == scan recurrence."""
    layers, x, seq_lengths, (T, B, D, H) = setup
    from rnn_speech_tpu.ops import lstm_pallas
    import jax.experimental.pallas as pl  # noqa: F401

    state = lstm.zero_state(1, B, H)[0]
    ys_ref, (c_ref, h_ref) = lstm.lstm_layer_scan(layers[0], x, seq_lengths, state)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        ys, (c, h) = lstm_pallas.lstm_layer_pallas(layers[0], x, seq_lengths, state)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)


def test_pallas_grads_match_scan(setup):
    """Custom-VJP backward kernel == autodiff through the scan recurrence,
    for every input: weights, bias, inputs and the initial (c, h) state."""
    layers, x, seq_lengths, (T, B, D, H) = setup
    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops import lstm_pallas

    state = lstm.zero_state(1, B, H)[0]
    # Nonzero initial state so dc0/dh0 exercise real values.
    state = (state[0] + 0.3, state[1] - 0.2)
    key = jax.random.PRNGKey(7)
    wy = jax.random.normal(key, (T, B, H)) * 0.1  # random output cotangent mix

    def loss(fn):
        def inner(params, xx, st):
            ys, (c, h) = fn(params, xx, seq_lengths, st)
            return jnp.sum(ys * wy) + jnp.sum(c**2) + jnp.sum(jnp.abs(h))
        return inner

    ref_grads = jax.grad(loss(lstm.lstm_layer_scan), argnums=(0, 1, 2))(
        layers[0], x, state
    )
    with pltpu.force_tpu_interpret_mode():
        pal_grads = jax.grad(
            loss(lstm_pallas.lstm_layer_pallas), argnums=(0, 1, 2)
        )(layers[0], x, state)

    for ref, pal in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(pal_grads)):
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(ref), atol=2e-4, rtol=1e-3
        )


def test_pallas_bf16_residual_grads_close_to_f32(setup):
    """bf16 residual storage (the long-T HBM recipe): forward values are
    IDENTICAL to the f32-residual path (residuals never feed the primal),
    and gradients agree to bf16-roundoff tolerance."""
    layers, x, seq_lengths, (T, B, D, H) = setup
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops import lstm_pallas

    state = lstm.zero_state(1, B, H)[0]
    state = (state[0] + 0.3, state[1] - 0.2)
    bf16_layer = functools.partial(
        lstm_pallas.lstm_layer_pallas, residual_dtype=jnp.bfloat16
    )

    def loss(fn):
        def inner(params, xx, st):
            ys, (c, h) = fn(params, xx, seq_lengths, st)
            return jnp.sum(ys**2) + jnp.sum(c * h), ys
        return inner

    with pltpu.force_tpu_interpret_mode():
        (v32, y32), g32 = jax.value_and_grad(
            loss(lstm_pallas.lstm_layer_pallas), argnums=(0, 1, 2),
            has_aux=True,
        )(layers[0], x, state)
        (v16, y16), g16 = jax.value_and_grad(
            loss(bf16_layer), argnums=(0, 1, 2), has_aux=True
        )(layers[0], x, state)

    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))
    np.testing.assert_allclose(float(v16), float(v32), rtol=1e-6)
    for ref, low in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        ref, low = np.asarray(ref), np.asarray(low)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(low - ref).max() / scale < 2e-2


def test_pallas_recompute_mode_grads_match_scan(setup):
    """residual_mode="recompute" (cell-sequence-only residuals, gates
    rebuilt in the backward kernel): exact gradients at f32 residuals,
    bf16-roundoff-close at bf16 — for weights, bias, inputs and state."""
    layers, x, seq_lengths, (T, B, D, H) = setup
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops import lstm_pallas

    # The recompute backward streams the layer input into a (B, D) @
    # (D, 4H) matmul; use a square layer like the acoustic stack's.
    layers = lstm.init_lstm_stack(jax.random.PRNGKey(3), 1, H, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, H))
    state = (jnp.zeros((B, H)) + 0.3, jnp.zeros((B, H)) - 0.2)

    def loss(fn):
        def inner(params, xx, st):
            ys, (c, h) = fn(params, xx, seq_lengths, st)
            return jnp.sum(ys**2) + jnp.sum(c * h)
        return inner

    ref = jax.grad(loss(lstm.lstm_layer_scan), argnums=(0, 1, 2))(
        layers[0], x, state
    )
    with pltpu.force_tpu_interpret_mode():
        exact = jax.grad(
            loss(functools.partial(
                lstm_pallas.lstm_layer_pallas, residual_mode="recompute",
                residual_dtype=jnp.float32,
            )), argnums=(0, 1, 2),
        )(layers[0], x, state)
        low = jax.grad(
            loss(functools.partial(
                lstm_pallas.lstm_layer_pallas, residual_mode="recompute",
                residual_dtype=jnp.bfloat16,
            )), argnums=(0, 1, 2),
        )(layers[0], x, state)
    for r, e in zip(jax.tree.leaves(ref), jax.tree.leaves(exact)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(r),
                                   atol=2e-4, rtol=1e-3)
    for r, l in zip(jax.tree.leaves(ref), jax.tree.leaves(low)):
        r, l = np.asarray(r), np.asarray(l)
        assert np.abs(l - r).max() / (np.abs(r).max() + 1e-9) < 2e-2


def test_pallas_grads_masked_rows_passthrough(setup):
    """Zero-length rows: state grads pass straight through the layer."""
    layers, x, _, (T, B, D, H) = setup
    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops import lstm_pallas

    seq_lengths = jnp.array([0, T, 3])
    state = (jnp.ones((B, H)) * 0.5, jnp.ones((B, H)) * -0.25)

    def loss(params, st):
        ys, (c, h) = lstm_pallas.lstm_layer_pallas(params, x, seq_lengths, st)
        return jnp.sum(c) + 2.0 * jnp.sum(h)

    with pltpu.force_tpu_interpret_mode():
        gp, gs = jax.grad(loss, argnums=(0, 1))(layers[0], state)
    # Row 0 never updates: cn = c0, hn = h0 -> dc0 = 1, dh0 = 2 exactly.
    np.testing.assert_allclose(np.asarray(gs[0][0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs[1][0]), 2.0, atol=1e-6)
    assert np.isfinite(np.asarray(gp["w_h"])).all()


def test_time_chunked_matches_whole(setup):
    """time_chunk processing == whole-sequence values AND gradients."""
    layers, x, seq_lengths, (T, B, D, H) = setup
    states = lstm.zero_state(2, B, H)

    def run(chunk):
        def loss(ls, xx):
            ys, st = lstm.lstm_stack(
                ls, xx, seq_lengths, states, time_chunk=chunk
            )
            return jnp.sum(ys ** 2) + sum(jnp.sum(c) for c, h in st), ys
        (val, ys), grads = jax.value_and_grad(loss, has_aux=True)(layers, x)
        return val, ys, grads

    v0, y0, g0 = run(0)
    for chunk in (5, 4, T):   # non-dividing chunk exercises padding
        v1, y1, g1 = run(chunk)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5, rtol=1e-5)


def test_time_chunked_pallas_interpret(setup):
    """Chunked path composes with the Pallas layer (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    layers, x, seq_lengths, (T, B, D, H) = setup
    states = lstm.zero_state(2, B, H)
    y0, _ = lstm.lstm_stack(layers, x, seq_lengths, states)
    with pltpu.force_tpu_interpret_mode():
        y1, _ = lstm.lstm_stack(
            layers, x, seq_lengths, states, use_pallas=True, time_chunk=4
        )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
