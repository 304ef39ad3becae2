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
