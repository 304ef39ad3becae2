"""Checkpointing: flat-npz parameter bundles + a latest-pointer manifest.

Mirrors the reference's filtered-Saver contract
(/root/reference/models/AcousticModel.py:483-527): what persists is the
model parameters plus ``global_step`` and ``learning_rate`` — deliberately
NOT optimizer slots, metric accumulators, or recurrent state, so restarts
resume the schedule but re-warm Adam, exactly like the reference.  A
``checkpoint`` text pointer names the latest bundle, and restore tolerates
an empty directory ("fresh parameters").

Format: a single ``.npz`` whose keys are slash-joined pytree paths — easy
to inspect (``np.load``), diff, and load partially.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

POINTER_FILE = "checkpoint"
PREFIX = "acousticmodel"

# Key listing which arrays in a bundle are bfloat16 stored as raw uint16
# bits.  numpy's npz format cannot round-trip ml_dtypes' bfloat16 descr,
# so half-precision bundles (the committed trained_models/ artifacts)
# view the bits as uint16 on save and view them back on load;
# ``_unflatten_like`` then upcasts losslessly into the f32 template.
BF16_KEYS = "__bf16_keys__"


def _encode_bf16(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Round float arrays to bfloat16, stored as uint16 bit patterns."""
    import ml_dtypes

    out, bf16_keys = {}, []
    for key, value in flat.items():
        if not key.startswith("__") and value.dtype in (
            np.float32, np.float64
        ):
            out[key] = np.asarray(value, np.float32).astype(
                ml_dtypes.bfloat16
            ).view(np.uint16)
            bf16_keys.append(key)
        else:
            out[key] = value
    if bf16_keys:
        out[BF16_KEYS] = np.asarray(bf16_keys)
    return out


def _decode_bf16(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    import ml_dtypes

    keys = flat.pop(BF16_KEYS, None)
    if keys is not None:
        for key in np.asarray(keys).tolist():
            flat[key] = flat[key].view(ml_dtypes.bfloat16)
    return flat


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key not in flat:
            raise KeyError(f"Checkpoint missing parameter {key!r}")
        value = flat[key]
        if tuple(value.shape) != tuple(leaf.shape):
            raise ValueError(
                f"Checkpoint shape mismatch for {key!r}: "
                f"{value.shape} vs model {tuple(leaf.shape)}"
            )
        leaves.append(value.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save(
    checkpoint_dir: str,
    params: Any,
    step: int,
    learning_rate: float,
    keep: int = 5,
    weights_dtype: str = "float32",
) -> str:
    """Write ``acousticmodel-<step>.npz`` and update the pointer file.

    Retains only the ``keep`` highest-step bundles, like the reference's
    ``tf.train.Saver`` default ``max_to_keep=5``
    (/root/reference/models/AcousticModel.py:526); ``keep <= 0`` disables
    pruning.  ``weights_dtype="bfloat16"`` halves the bundle (committed
    trained_models/ artifacts); restore upcasts into the f32 template."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    flat = _flatten(params)
    if weights_dtype == "bfloat16":
        flat = _encode_bf16(flat)
    elif weights_dtype != "float32":
        raise ValueError(f"Unsupported weights_dtype {weights_dtype!r}")
    flat["__step__"] = np.asarray(int(step), np.int64)
    flat["__learning_rate__"] = np.asarray(float(learning_rate), np.float64)
    name = f"{PREFIX}-{int(step)}.npz"
    path = os.path.join(checkpoint_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **flat)
    os.replace(tmp, path)
    pointer = os.path.join(checkpoint_dir, POINTER_FILE)
    pointer_tmp = pointer + ".tmp"
    with open(pointer_tmp, "w") as fh:
        json.dump({"latest": name}, fh)
    os.replace(pointer_tmp, pointer)
    if keep > 0:
        steps = []
        for entry in os.listdir(checkpoint_dir):
            m = re.fullmatch(rf"{PREFIX}-(\d+)\.npz", entry)
            if m:
                steps.append(int(m.group(1)))
        for old_step in sorted(steps)[:-keep]:
            if old_step == int(step):
                continue
            try:
                os.remove(
                    os.path.join(checkpoint_dir, f"{PREFIX}-{old_step}.npz")
                )
                # Visible by default: a dir accumulated under an older
                # keep-all policy gets trimmed on the first save, which
                # users should see happening (ADVICE r1).
                logger.info(
                    "Pruned old checkpoint %s-%d.npz (keeping newest %d)",
                    PREFIX, old_step, keep,
                )
            except OSError:   # concurrent cleanup/readers: best effort
                pass
    logger.info("Checkpoint saved: %s", path)
    return path


def latest_path(checkpoint_dir: str) -> Optional[str]:
    pointer = os.path.join(checkpoint_dir, POINTER_FILE)
    if os.path.exists(pointer):
        # Tolerate a corrupt/truncated pointer (e.g. crash mid-write on a
        # pre-atomic-rename version): fall through to the directory scan,
        # which recovers from the atomically-written bundles themselves.
        try:
            with open(pointer) as fh:
                name = json.load(fh).get("latest")
        except (json.JSONDecodeError, OSError):
            name = None
        if name:
            path = os.path.join(checkpoint_dir, name)
            if os.path.exists(path):
                return path
    # Fallback: scan for the highest step.
    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_step = None, -1
    for entry in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf"{PREFIX}-(\d+)\.npz", entry)
        if m and int(m.group(1)) > best_step:
            best, best_step = entry, int(m.group(1))
    return os.path.join(checkpoint_dir, best) if best else None


def restore(
    checkpoint_dir: str, params_template: Any
) -> Optional[Tuple[Any, int, float]]:
    """Load the latest checkpoint -> (params, step, lr), or None if absent."""
    path = latest_path(checkpoint_dir)
    if path is None:
        logger.info("Created model with fresh parameters.")
        return None
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    flat = _decode_bf16(flat)
    step = int(flat.pop("__step__"))
    lr = float(flat.pop("__learning_rate__"))
    params = _unflatten_like(params_template, flat)
    logger.info("Restored model parameters from %s (global_step %d)", path, step)
    return params, step, lr


def convert_bundle(
    src_path: str, dst_dir: str, weights_dtype: str = "bfloat16"
) -> str:
    """Re-encode one bundle file into ``dst_dir`` (same name + pointer).

    Used by the trained-model exporter to commit half-size bf16 bundles;
    a float32 target round-trips an already-bf16 bundle losslessly."""
    with np.load(src_path) as data:
        flat = _decode_bf16({k: data[k] for k in data.files})
    meta = {k: flat.pop(k) for k in ("__step__", "__learning_rate__")}
    if weights_dtype == "bfloat16":
        flat = _encode_bf16(flat)
    elif weights_dtype == "float32":
        # npz cannot hold bf16 descrs: a decoded-bf16 source upcasts.
        import ml_dtypes

        bf16 = np.dtype(ml_dtypes.bfloat16)
        flat = {
            k: v.astype(np.float32) if v.dtype == bf16 else v
            for k, v in flat.items()
        }
    else:
        raise ValueError(f"Unsupported weights_dtype {weights_dtype!r}")
    flat.update(meta)
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(src_path))
    tmp = dst + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **flat)
    os.replace(tmp, dst)
    pointer_tmp = os.path.join(dst_dir, POINTER_FILE + ".tmp")
    with open(pointer_tmp, "w") as fh:
        json.dump({"latest": os.path.basename(dst)}, fh)
    os.replace(pointer_tmp, os.path.join(dst_dir, POINTER_FILE))
    return dst
