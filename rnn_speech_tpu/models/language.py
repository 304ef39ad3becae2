"""Character-level language model.

Capability rebuild of /root/reference/models/LanguageModel.py — the same
stacked-LSTM body as the acoustic model with one-hot character inputs
(input_dim == num_labels, LanguageModel.py:48-50) and an offset-by-one
target stream (build_dataset at LanguageModel.py:604-644).

Documented deviation: the reference trained its LM with a cloned CTC head
(its own header says "Not yet implemented!"; CTC over offset labels is
architecturally wrong for an LM).  This rebuild completes the model as
designed: next-character cross-entropy with length masking, plus sampling
utilities for ``--generate_text``.  The architecture and I/O contract
(one-hot chars in, char distribution out, carried state) are unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from rnn_speech_tpu.models import acoustic
from rnn_speech_tpu.ops import lstm


@dataclass(frozen=True)
class LanguageConfig:
    num_layers: int
    hidden_size: int
    num_labels: int
    compute_dtype: Any = jnp.float32

    def as_acoustic(self) -> acoustic.AcousticConfig:
        return acoustic.AcousticConfig(
            num_layers=self.num_layers,
            hidden_size=self.hidden_size,
            input_dim=self.num_labels,     # one-hot characters
            num_labels=self.num_labels,
            normalization=False,
            compute_dtype=self.compute_dtype,
        )


def init_params(key: jax.Array, cfg: LanguageConfig):
    return acoustic.init_params(key, cfg.as_acoustic())


def zero_state(cfg: LanguageConfig, batch_size: int):
    return lstm.zero_state(cfg.num_layers, batch_size, cfg.hidden_size)


def forward(
    params,
    cfg: LanguageConfig,
    one_hot_inputs: jnp.ndarray,   # (T, B, num_labels)
    seq_lengths: jnp.ndarray,
    states,
    *,
    dropout_rng: Optional[jax.Array] = None,
    input_keep_prob: float = 1.0,
    output_keep_prob: float = 1.0,
) -> Tuple[jnp.ndarray, Any]:
    return acoustic.forward(
        params, cfg.as_acoustic(), one_hot_inputs, seq_lengths, states,
        dropout_rng=dropout_rng,
        input_keep_prob=input_keep_prob,
        output_keep_prob=output_keep_prob,
    )


def stepper(params, cfg: LanguageConfig):
    """(init, advance) single-character stepping interface for decoders.

    Shapes are flat over hypotheses: state leaves are (N, H), log-prob
    outputs (N, num_labels).  ``init(n)`` conditions on a zero input vector
    (the no-context prior — the char map has no BOS symbol);
    ``advance(state, chars)`` consumes one character id per hypothesis.
    This is the hook rnn_speech_tpu.ops.decode uses for AM+LM shallow
    fusion (the reference's roadmap item 3, never reached there).
    """
    ones = lambda n: jnp.ones((n,), jnp.int32)

    def init(n: int):
        states = zero_state(cfg, n)
        x = jnp.zeros((1, n, cfg.num_labels), jnp.float32)
        logits, states = forward(params, cfg, x, ones(n), states)
        return states, jax.nn.log_softmax(logits[0], axis=-1)

    def advance(states, chars: jnp.ndarray):
        n = chars.shape[0]
        x = jax.nn.one_hot(chars, cfg.num_labels, dtype=jnp.float32)[None]
        logits, states = forward(params, cfg, x, ones(n), states)
        return states, jax.nn.log_softmax(logits[0], axis=-1)

    return init, advance


def next_char_loss(
    params,
    cfg: LanguageConfig,
    char_ids: jnp.ndarray,        # (T, B) int32; -1 padding
    seq_lengths: jnp.ndarray,     # (B,) true lengths
    states,
    *,
    dropout_rng: Optional[jax.Array] = None,
    input_keep_prob: float = 1.0,
    output_keep_prob: float = 1.0,
) -> jnp.ndarray:
    """Mean masked cross-entropy of predicting char[t+1] from chars[<=t]."""
    T, B = char_ids.shape
    safe = jnp.maximum(char_ids, 0)
    one_hot = jax.nn.one_hot(safe, cfg.num_labels, dtype=jnp.float32)
    logits, _ = forward(
        params, cfg, one_hot, seq_lengths, states,
        dropout_rng=dropout_rng,
        input_keep_prob=input_keep_prob,
        output_keep_prob=output_keep_prob,
    )
    # Target at step t is the char at t+1; last valid step has no target.
    targets = jnp.concatenate([safe[1:], jnp.zeros((1, B), jnp.int32)], axis=0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # One-hot select instead of a lane-axis gather (slow on TPU); exact.
    tgt_oh = targets[:, :, None] == jnp.arange(cfg.num_labels)[None, None, :]
    nll = -jnp.sum(jnp.where(tgt_oh, logp, 0.0), axis=-1)
    mask = (jnp.arange(T)[:, None] < (seq_lengths - 1)[None, :]).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sample_next(
    params,
    cfg: LanguageConfig,
    char_id: jnp.ndarray,          # (B,) current char ids
    states,
    *,
    rng: Optional[jax.Array] = None,
    temperature: float = 0.0,
):
    """One autoregressive step. temperature 0 = argmax. Returns (ids, states)."""
    one_hot = jax.nn.one_hot(char_id, cfg.num_labels, dtype=jnp.float32)[None]
    logits, states = forward(
        params, cfg, one_hot, jnp.ones_like(char_id), states
    )
    logits = logits[0]
    if temperature <= 0.0 or rng is None:
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        ids = jax.random.categorical(rng, logits / temperature, axis=-1).astype(jnp.int32)
    return ids, states


def generate(
    params,
    cfg: LanguageConfig,
    seed_ids,                      # list/array of int seed chars
    num_steps: int,
    *,
    rng: Optional[jax.Array] = None,
    temperature: float = 0.0,
) -> list:
    """Generate ``num_steps`` characters continuing the seed (batch of 1)."""
    states = zero_state(cfg, 1)
    ids = None
    # Feed the seed.
    for s in seed_ids:
        ids, states = sample_next(
            params, cfg, jnp.asarray([s], jnp.int32), states,
            rng=rng, temperature=temperature,
        )
    out = []
    for _ in range(num_steps):
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        out.append(int(ids[0]))
        ids, states = sample_next(
            params, cfg, ids, states, rng=sub, temperature=temperature
        )
    return out
