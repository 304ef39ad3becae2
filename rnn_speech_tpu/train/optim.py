"""Optimizer: Adam + global-norm clipping, hand-rolled on pytrees.

Replaces ``tf.train.AdamOptimizer`` + ``tf.clip_by_global_norm`` as wired at
/root/reference/models/AcousticModel.py:385-407.  Defaults match TF's Adam
(beta1=0.9, beta2=0.999, eps=1e-8).  The reference's cross-step gradient
accumulation Variables become a ``lax.scan`` over microbatches in the train
step; clipping applies to the *summed* accumulated gradients exactly as the
reference clipped its accumulator variables before apply.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def init_adam(params: Pytree) -> Dict[str, Any]:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {
        "m": zeros,
        "v": jax.tree.map(jnp.zeros_like, params),
        "t": jnp.zeros((), jnp.int32),
    }


def global_norm(tree: Pytree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(tree))
    )


def clip_by_global_norm(grads: Pytree, clip: float) -> Tuple[Pytree, jnp.ndarray]:
    """tf.clip_by_global_norm semantics: scale by clip/max(norm, clip).

    clip <= 0 disables clipping (the documented config spelling for "no
    clip") rather than zeroing every gradient."""
    return clip_with_norm(grads, clip, global_norm(grads))


def clip_with_norm(
    grads: Pytree, clip: float, norm: jnp.ndarray
) -> Tuple[Pytree, jnp.ndarray]:
    """Clip against an externally-computed global norm — model-axis-sharded
    training must fold cross-shard squared sums into the norm, which the
    local tree alone cannot see."""
    if clip <= 0:
        return grads, norm
    scale = clip / jnp.maximum(norm, clip)
    return jax.tree.map(lambda g: g * scale, grads), norm


def adam_update(
    params: Pytree,
    grads: Pytree,
    opt_state: Dict[str, Any],
    learning_rate: jnp.ndarray,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Pytree, Dict[str, Any]]:
    t = opt_state["t"] + 1
    tf32 = t.astype(jnp.float32)
    m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g, opt_state["m"], grads)
    v = jax.tree.map(
        lambda v_, g: beta2 * v_ + (1 - beta2) * jnp.square(g), opt_state["v"], grads
    )
    # TF-style bias correction folded into the step size.
    alpha = learning_rate * jnp.sqrt(1 - beta2 ** tf32) / (1 - beta1 ** tf32)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - alpha * m_ / (jnp.sqrt(v_) + eps), params, m, v
    )
    return new_params, {"m": m, "v": v, "t": t}
