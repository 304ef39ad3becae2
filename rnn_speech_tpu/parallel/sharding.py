"""Sharding specs + sharded train/eval step construction.

Data-parallel layout (the scaling plan from SURVEY §2c):
  * batch tensors  (MB, B, ...)  -> PartitionSpec(None, "data", ...)
  * recurrent state (B, H)       -> PartitionSpec("data", None)
  * parameters / optimizer state -> replicated, except the LSTM gate
    matrices' 4H output dim and the projection matrices, which shard over
    the "model" axis when mesh_model > 1.

With these in/out shardings on ``jax.jit``, XLA GSPMD inserts the gradient
all-reduce (psum over "data") and any model-axis collectives — no explicit
communication code, which is exactly the TPU-idiomatic arrangement (the
collectives ride ICI inside a slice).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rnn_speech_tpu.train import step as step_mod


def _param_spec(path_key: str, shape, model_axis: bool) -> P:
    """Sharding for one parameter tensor."""
    if not model_axis:
        return P()
    if path_key.endswith("w_x") or path_key.endswith("w_h"):
        return P(None, "model")       # shard the 4H gate dim
    if path_key == "b" and len(shape) == 1:
        return P("model")
    return P()


def state_shardings(mesh: Mesh, state: step_mod.TrainState):
    """Sharding pytree matching a TrainState."""
    model_axis = mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        top = keys[0] if keys else ""
        if top == "states":
            return NamedSharding(mesh, P("data", None))
        if top in ("params", "opt"):
            if top == "opt" and keys[-1] == "t":
                return NamedSharding(mesh, P())
            return NamedSharding(mesh, _param_spec(keys[-1], leaf.shape, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, state)


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]):
    """Batch tensors (MB, B, ...): shard B over the data axis."""
    out = {}
    for key, value in batch.items():
        spec = [None, "data"] + [None] * (value.ndim - 2)
        out[key] = NamedSharding(mesh, P(*spec))
    return out


def make_sharded_step(
    mesh: Mesh,
    scfg: step_mod.StepConfig,
    state: step_mod.TrainState,
) -> Tuple[step_mod.TrainState, Callable, Callable, Callable]:
    """Returns (sharded_state, put_batch, train_fn, eval_fn)."""
    s_shard = state_shardings(mesh, state)
    state = jax.device_put(state, s_shard)
    repl = NamedSharding(mesh, P())

    train_fn = jax.jit(
        step_mod.train_step,
        static_argnums=0,
        donate_argnums=(1,),
        out_shardings=(s_shard, {"mean_loss": repl, "mean_error_rate": repl,
                                 "grad_norm": repl}),
    )
    eval_fn = jax.jit(step_mod.eval_step, static_argnums=0)

    def put_batch(batch):
        return jax.device_put(dict(batch), batch_shardings(mesh, batch))

    return state, put_batch, train_fn, eval_fn
