"""Fused Pallas dropout: support, determinism, mask-regenerating VJP.

The kernel replaces the bernoulli+where dropout of the reference's
DropoutWrapper composition (/root/reference/models/AcousticModel.py:222-298)
on the TPU path.  CPU interpret mode stubs the core PRNG (all-zero bits →
every element kept), so these tests pin only the properties that hold under
both the stub and real hardware bits: the output support {0, x/keep},
per-key determinism, and forward/backward mask identity.  The *statistical*
properties (keep fraction, unbiasedness, key sensitivity) are asserted on
the real chip by tools/hw_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnn_speech_tpu.ops.dropout_pallas import dropout_pallas


def _support_ok(out, allowed, atol=1e-6):
    vals = np.unique(np.asarray(out, dtype=np.float64))
    return all(any(abs(v - a) <= atol * max(1.0, abs(a)) for a in allowed)
               for v in vals)


def test_output_support():
    x = jnp.ones((500, 256), jnp.float32) * 3.0
    with pltpu.force_tpu_interpret_mode():
        out = dropout_pallas(jax.random.PRNGKey(0), x, [0.8])
    assert _support_ok(out, [0.0, 3.0 / 0.8])


def test_two_keeps_compose():
    x = jnp.ones((400, 256), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = dropout_pallas(jax.random.PRNGKey(7), x, [0.8, 0.5])
    assert _support_ok(out, [0.0, 1.0 / 0.4])


def test_deterministic_per_key():
    x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)
    with pltpu.force_tpu_interpret_mode():
        a = dropout_pallas(jax.random.PRNGKey(3), x, [0.5])
        b = dropout_pallas(jax.random.PRNGKey(3), x, [0.5])
    assert bool((a == b).all())


def test_vjp_regenerates_forward_mask():
    """grad of sum equals the forward's own mask*scale, elementwise."""
    x = jnp.full((64, 256), 2.0, jnp.float32)
    key = jax.random.PRNGKey(11)
    with pltpu.force_tpu_interpret_mode():
        out = dropout_pallas(key, x, [0.7])
        g = jax.grad(lambda v: dropout_pallas(key, v, [0.7]).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(out) / 2.0,
                               rtol=1e-6)


def test_keep_one_is_identity_and_dtype_preserved():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 256)).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        same = dropout_pallas(jax.random.PRNGKey(1), x, [1.0])
        out = dropout_pallas(jax.random.PRNGKey(1), x, [0.5])
    assert same is x
    assert out.dtype == jnp.bfloat16


def test_3d_shape_and_ragged_rows():
    # rows not a multiple of the block: exercises the padded final block.
    x = jnp.ones((37, 5, 256), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = dropout_pallas(jax.random.PRNGKey(2), x, [0.9])
    assert out.shape == x.shape
    assert _support_ok(out, [0.0, 1.0 / 0.9])


def test_rejects_bad_keep():
    with pytest.raises(ValueError):
        with pltpu.force_tpu_interpret_mode():
            dropout_pallas(jax.random.PRNGKey(0), jnp.ones((8, 128)), [0.0])


def test_stack_integration_pallas_dropout():
    """lstm_stack(use_pallas=True) routes dropout through the fused kernel:
    training output differs from the clean pass, inference (rng=None)
    matches the no-dropout stack exactly."""
    from rnn_speech_tpu.ops.lstm import init_lstm_stack, lstm_stack, zero_state

    T, B, D, H = 12, 4, 128, 128
    layers = init_lstm_stack(jax.random.PRNGKey(0), 2, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    lens = jnp.array([12, 9, 4, 1])
    states = zero_state(2, B, H)
    with pltpu.force_tpu_interpret_mode():
        clean, _ = lstm_stack(layers, x, lens, [tuple(s) for s in states],
                              use_pallas=True, dropout_rng=None,
                              input_keep_prob=0.5, output_keep_prob=0.5)
        dropped, _ = lstm_stack(layers, x, lens, [tuple(s) for s in states],
                                use_pallas=True,
                                dropout_rng=jax.random.PRNGKey(5),
                                input_keep_prob=0.5, output_keep_prob=0.5)
    assert clean.shape == dropped.shape
    # Even with the interpret-mode PRNG stub (all kept), the 1/keep scaling
    # guarantees the training pass differs from the clean pass.
    assert not np.allclose(np.asarray(clean), np.asarray(dropped))

def test_bernoulli_mask_shape_dtype_and_interpret_stub():
    """bernoulli_mask_pallas: ND shape round-trip, requested dtype, and the
    interpret-mode PRNG stub (all-zero bits < threshold) keeps everything."""
    from rnn_speech_tpu.ops.dropout_pallas import bernoulli_mask_pallas

    with pltpu.force_tpu_interpret_mode():
        m = bernoulli_mask_pallas(jax.random.PRNGKey(3), (2, 5, 4, 128), 0.7,
                                  jnp.bfloat16)
    assert m.shape == (2, 5, 4, 128)
    assert m.dtype == jnp.bfloat16
    assert np.asarray(m, np.float32).min() >= 0.0
    assert np.asarray(m, np.float32).max() <= 1.0
    # interpret stubs prng_random_bits to zeros -> every element kept
    assert np.asarray(m, np.float32).mean() == 1.0


def test_bernoulli_mask_accepts_typed_and_raw_keys():
    from rnn_speech_tpu.ops.dropout_pallas import bernoulli_mask_pallas

    with pltpu.force_tpu_interpret_mode():
        a = bernoulli_mask_pallas(jax.random.PRNGKey(9), (8, 128), 0.5)
        b = bernoulli_mask_pallas(jax.random.key(9, impl="rbg"), (8, 128), 0.5)
    assert a.shape == b.shape == (8, 128)
