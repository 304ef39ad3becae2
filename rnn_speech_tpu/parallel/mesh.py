"""Mesh construction over the available devices.

The reference is strictly single-device (SURVEY §2c: no NCCL/MPI/
distribution of any kind; its only "parallelism" is in-graph gradient
accumulation).  This framework scales by SPMD over a
``jax.sharding.Mesh`` with axes ``("data", "model")``:

  * ``data`` — batch-dimension sharding; gradient all-reduce rides ICI,
    inserted automatically by XLA GSPMD when replicated parameters meet a
    data-sharded batch.
  * ``model`` — reserved for sharding the LSTM gate matrices' output
    dimension (hidden 1024 fits one chip, so parity needs mesh_model=1,
    but the axis exists so wider models shard without restructuring).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 0, model: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh; data=0 means "all remaining"."""
    devices = list(devices if devices is not None else jax.devices())
    if model < 1:
        model = 1
    if data <= 0:
        data = max(1, len(devices) // model)
    need = data * model
    if need > len(devices):
        raise ValueError(
            f"Mesh {data}x{model} needs {need} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Optional[Mesh]:
    return make_mesh(1, 1)
