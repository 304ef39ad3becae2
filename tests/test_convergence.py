"""End-to-end learning test: the full train step must drive CTC to zero
error on a tiny memorization task (the reference never tested that its
training system learns; this pins the gradient path, the optimizer, the
decoder and the metric together)."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_speech_tpu.models import acoustic
from rnn_speech_tpu.train import step as step_mod


def test_train_step_memorizes_tiny_task():
    T, B, D, V = 60, 2, 8, 12
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(0, 1, (1, B, T, D)).astype(np.float32))
    labels = np.full((1, B, 10), -1, np.int32)
    labels[0, 0, :4] = [1, 2, 3, 4]
    labels[0, 1, :5] = [5, 6, 7, 8, 9]
    batch = {
        "features": feats,
        "frame_lengths": jnp.full((1, B), T, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.asarray([[4, 5]], jnp.int32),
    }
    cfg = acoustic.AcousticConfig(
        num_layers=1, hidden_size=64, input_dim=D, num_labels=V
    )
    scfg = step_mod.StepConfig(
        model=cfg, input_keep_prob=1.0, output_keep_prob=1.0
    )
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, B, 3e-3)
    fn = jax.jit(step_mod.train_step, static_argnums=0)

    first_loss = None
    for i in range(150):
        state, metrics = fn(
            scfg, state, batch, jax.random.PRNGKey(i), jnp.asarray(True)
        )
        if first_loss is None:
            first_loss = float(metrics["mean_loss"])

    assert float(metrics["mean_loss"]) < 0.01 < first_loss
    assert float(metrics["mean_error_rate"]) == 0.0
