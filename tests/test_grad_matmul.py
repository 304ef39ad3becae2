"""Fused weight-gradient contraction vs the reference einsum forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnn_speech_tpu.ops.grad_matmul_pallas import dgates_weight_grads


def _reference(h, x, dg, cd=jnp.bfloat16):
    dgc = dg.reshape(-1, dg.shape[-1]).astype(cd)
    dwh = jnp.einsum("nh,ng->hg", h.reshape(-1, h.shape[-1]).astype(cd), dgc,
                     preferred_element_type=jnp.float32)
    dwx = jnp.einsum("nd,ng->dg", x.reshape(-1, x.shape[-1]).astype(cd), dgc,
                     preferred_element_type=jnp.float32)
    # db sums the UNROUNDED dg: the kernel streams dg in its caller dtype
    # and only casts for the MXU contractions.
    db = jnp.sum(dg.reshape(-1, dg.shape[-1]).astype(jnp.float32), axis=0)
    return dwh, dwx, db


@pytest.mark.parametrize("shape", [
    (16, 4, 128, 128, 512),      # T, B, H, D, G — divisible chunk path
    (7, 3, 128, 256, 384),       # ragged N -> zero-pad path
    (12, 4, 128, 120, 512),      # D=120: the real L0 fbank width (lane pad)
])
def test_matches_einsums(shape):
    T, B, H, D, G = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    h = jax.random.normal(ks[0], (T, B, H), jnp.float32)
    x = jax.random.normal(ks[1], (T, B, D), jnp.float32)
    dg = jax.random.normal(ks[2], (T, B, G), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        dwh, dwx, db = dgates_weight_grads(h, x, dg)
    rwh, rwx, rdb = _reference(h, x, dg)
    np.testing.assert_allclose(np.asarray(dwh), np.asarray(rwh),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dwx), np.asarray(rwx),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rdb),
                               rtol=1e-4, atol=1e-4)


def test_single_weight_grad():
    from rnn_speech_tpu.ops.grad_matmul_pallas import weight_grad

    T, B, D, G = 10, 3, 256, 80          # G=80: the label-count shape
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    x = jax.random.normal(ks[0], (T, B, D), jnp.float32)
    dg = jax.random.normal(ks[1], (T, B, G), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        dw, db = weight_grad(x, dg)
    _, rwx, rdb = _reference(x, x, dg)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rwx),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rdb),
                               rtol=1e-4, atol=1e-4)


def test_dense_vjp_matches_plain_path():
    """acoustic._dense (fused weight grads) == the plain dot under grad."""
    from rnn_speech_tpu.models import acoustic

    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    h = jax.random.normal(ks[0], (12, 4, 128), jnp.float32)
    w = jax.random.normal(ks[1], (128, 256), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (256,), jnp.float32) * 0.1
    co = jax.random.normal(ks[3], (12, 4, 256), jnp.float32)

    def plain(h, w, b):
        y = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b
        return jnp.sum(y * co)

    def fused(h, w, b):
        return jnp.sum(acoustic._dense(h, w, b, jnp.bfloat16) * co)

    with pltpu.force_tpu_interpret_mode():
        fy, fg = jax.value_and_grad(fused, argnums=(0, 1, 2))(h, w, b)
    py, pg = jax.value_and_grad(plain, argnums=(0, 1, 2))(h, w, b)
    np.testing.assert_allclose(float(fy), float(py), rtol=1e-6)
    for f, p, tol in zip(fg, pg, (5e-2, 5e-2, 1e-3)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(p),
                                   rtol=tol, atol=tol)


def test_f32_compute_dtype_exact():
    T, B, H, D, G = 8, 2, 128, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    h = jax.random.normal(ks[0], (T, B, H), jnp.float32)
    x = jax.random.normal(ks[1], (T, B, D), jnp.float32)
    dg = jax.random.normal(ks[2], (T, B, G), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        dwh, dwx, db = dgates_weight_grads(h, x, dg,
                                           compute_dtype=jnp.float32)
    rwh, rwx, rdb = _reference(h, x, dg, cd=jnp.float32)
    np.testing.assert_allclose(np.asarray(dwh), np.asarray(rwh),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwx), np.asarray(rwx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rdb),
                               rtol=1e-5, atol=1e-5)
