"""AM+LM shallow-fusion decoding tests (reference roadmap item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_speech_tpu.models import language
from rnn_speech_tpu.ops import decode


@pytest.fixture(scope="module")
def tiny_lm():
    """A tiny char-LM trained to strongly prefer 1 -> 2 over 1 -> 3."""
    V = 6
    cfg = language.LanguageConfig(num_layers=1, hidden_size=32, num_labels=V)
    params = language.init_params(jax.random.PRNGKey(0), cfg)

    from rnn_speech_tpu.train import optim

    texts = np.array([[1, 2, 1, 2, 1, 2, 1, 2]], np.int32).T  # (T, B=1)
    lengths = jnp.asarray([texts.shape[0]], jnp.int32)
    opt = optim.init_adam(params)

    @jax.jit
    def train(params, opt):
        def loss_fn(p):
            return language.next_char_loss(
                p, cfg, jnp.asarray(texts), lengths,
                language.zero_state(cfg, 1),
            )
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = optim.adam_update(params, grads, opt, 1e-2)
        return params, opt, loss

    for _ in range(300):
        params, opt, loss = train(params, opt)
    assert float(loss) < 0.1
    return params, cfg, V


def _ambiguous_logits(V, blank, T=8, tilt=0.05):
    """AM slightly prefers [1, 3]; [1, 2] is a close second."""
    lg = np.full((T, 1, V), -8.0, np.float32)
    lg[:, 0, blank] = 2.0
    lg[2, 0, 1] = 6.0
    lg[5, 0, 3] = 4.0 + tilt
    lg[5, 0, 2] = 4.0 - tilt
    return jnp.asarray(lg)


def test_lm_weight_zero_matches_plain(tiny_lm):
    params, cfg, V = tiny_lm
    blank = V - 1
    logits = _ambiguous_logits(V, blank)
    ll = jnp.asarray([logits.shape[0]], jnp.int32)
    plain = decode.beam_search_decode(logits, ll, beam_width=4)
    lm = language.stepper(params, cfg)
    fused = decode.beam_search_decode(logits, ll, beam_width=4,
                                      lm=lm, lm_weight=0.0)
    for a, b in zip(plain, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_flips_near_tie(tiny_lm):
    """Without the LM the best path is [1, 3]; the 1->2 LM flips it."""
    params, cfg, V = tiny_lm
    blank = V - 1
    logits = _ambiguous_logits(V, blank)
    ll = jnp.asarray([logits.shape[0]], jnp.int32)

    labels, lengths, _ = decode.beam_search_decode(logits, ll, beam_width=4)
    best_plain = list(np.asarray(labels)[0, 0, : int(lengths[0, 0])])
    assert best_plain == [1, 3]

    lm = language.stepper(params, cfg)
    labels, lengths, scores = decode.beam_search_decode(
        logits, ll, beam_width=4, lm=lm, lm_weight=0.8
    )
    best_fused = list(np.asarray(labels)[0, 0, : int(lengths[0, 0])])
    assert best_fused == [1, 2]
    # Scores stay sorted best-first.
    s = np.asarray(scores)[0]
    assert np.all(np.diff(s) <= 1e-5)


def test_fusion_jit_and_batched(tiny_lm):
    params, cfg, V = tiny_lm
    blank = V - 1
    lm = language.stepper(params, cfg)
    rng = np.random.default_rng(0)
    T, B = 12, 3
    logits = jnp.asarray(rng.normal(0, 2, (T, B, V)).astype(np.float32))
    ll = jnp.asarray([12, 7, 0], jnp.int32)

    f = jax.jit(lambda lg, n: decode.beam_search_decode(
        lg, n, beam_width=4, lm=lm, lm_weight=0.5))
    labels, lengths, scores = f(logits, ll)
    assert labels.shape == (B, 4, T)
    # Zero-length example decodes to the empty string.
    assert int(lengths[2, 0]) == 0
    assert np.isfinite(np.asarray(scores)[:, 0]).all()
