#!/usr/bin/env python
"""Import the reference's TF-Saver acoustic checkpoint into npz bundles.

The reference ships its pretrained English model as a TF-1.4 Saver
checkpoint (/root/reference/trained_models/english/acoustic/ — a git-lfs
artifact) saved through a filtered variable list
(/root/reference/models/AcousticModel.py:501-527):

  Input_Layer/input_w  (input_dim, hidden)     -> input/w
  Input_Layer/input_b  (hidden,)               -> input/b
  ...cell_<l>.../kernel (2*hidden, 4*hidden)   -> lstm/<l>/w_x + lstm/<l>/w_h
  ...cell_<l>.../bias   (4*hidden,)            -> lstm/<l>/b
  Output_layer/output_w (hidden, num_labels)   -> output/w
  Output_layer/output_b (num_labels,)          -> output/b
  global_step, learning_rate                   -> __step__, __learning_rate__

BasicLSTMCell packs [x; h] rows into one kernel with gate columns in
(i, j, f, o) order and adds forget_bias=1.0 in-graph — exactly this
framework's (i, g, f, o) order and +1.0 forget bias
(rnn_speech_tpu/ops/lstm.py:_cell_step), so the kernel row-splits into
w_x/w_h verbatim with no column permutation.

With real weights this makes golden-transcript decode parity
(trained_models/english/acoustic/README.md:69-81) one download away
(VERDICT r1 #7); tests/test_tf_import.py exercises the mapping against a
synthetically-written TF checkpoint.

Usage:
  python tools/import_tf_checkpoint.py \
      --tf_checkpoint trained_models/english/acoustic/acousticmodel.ckpt \
      --output_dir data/checkpoints/acoustic
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_tf_variables(ckpt_prefix: str) -> Dict[str, np.ndarray]:
    """All variables of a TF-format checkpoint, by name (no ':0' suffix).

    Uses TensorFlow's pure checkpoint reader when available (no graph, no
    session); raises a clear error otherwise — TF is only needed for this
    one-time import, never at train/serve time."""
    try:
        import tensorflow as tf  # type: ignore
    except ImportError as exc:
        raise SystemExit(
            "Importing a TF checkpoint requires the tensorflow package for "
            "its checkpoint reader (pip install tensorflow-cpu); the "
            "framework itself never needs TF."
        ) from exc
    reader = tf.train.load_checkpoint(ckpt_prefix)
    shapes = reader.get_variable_to_shape_map()
    return {name: np.asarray(reader.get_tensor(name)) for name in shapes}


def map_reference_variables(tf_vars: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference Saver variables -> this framework's flat npz keys.

    Matches by the same name patterns the reference's ``_add_saving_op``
    filter used, so exact scope prefixes (which depend on TF version
    details) don't matter."""

    def find_one(pattern: str) -> np.ndarray:
        hits = [v for k, v in tf_vars.items() if re.search(pattern, k)]
        if len(hits) != 1:
            names = [k for k in tf_vars if re.search(pattern, k)]
            raise ValueError(
                f"Expected exactly one variable matching {pattern!r}, "
                f"found {names or 'none'}"
            )
        return hits[0]

    flat: Dict[str, np.ndarray] = {}
    flat["input/w"] = find_one(r"input_w$")
    flat["input/b"] = find_one(r"input_b$")
    flat["output/w"] = find_one(r"output_w$")
    flat["output/b"] = find_one(r"output_b$")

    hidden = flat["input/w"].shape[1]
    cells = sorted(
        int(m.group(1))
        for k in tf_vars
        if (m := re.search(r"cell_(\d+)\b.*/kernel$", k))
    )
    if not cells or cells != list(range(len(cells))):
        raise ValueError(f"LSTM cell kernels missing or non-contiguous: {cells}")
    for layer in cells:
        # \b keeps cell_1 from also matching cell_10+ in deep stacks.
        kernel = find_one(rf"cell_{layer}\b.*/kernel$")
        bias = find_one(rf"cell_{layer}\b.*/bias$")
        if kernel.shape != (2 * hidden, 4 * hidden):
            raise ValueError(
                f"cell_{layer} kernel shape {kernel.shape} != "
                f"{(2 * hidden, 4 * hidden)} — layer width mismatch"
            )
        # BasicLSTMCell concatenates [x; h] along rows: x rows first.
        flat[f"lstm/{layer}/w_x"] = kernel[:hidden]
        flat[f"lstm/{layer}/w_h"] = kernel[hidden:]
        flat[f"lstm/{layer}/b"] = bias
    step = 0
    for key, value in tf_vars.items():
        if re.search(r"global_step$", key):
            step = int(value)
        if re.search(r"learning_rate$", key):
            flat["__learning_rate__"] = np.asarray(float(value), np.float64)
    flat["__step__"] = np.asarray(step, np.int64)
    flat.setdefault("__learning_rate__", np.asarray(3e-4, np.float64))
    return flat


def import_checkpoint(tf_prefix: str, output_dir: str) -> str:
    """Convert + write an npz bundle with the pointer file. Returns path."""
    from rnn_speech_tpu.train import checkpoint as ckpt

    flat = map_reference_variables(read_tf_variables(tf_prefix))
    step = int(flat.pop("__step__"))
    lr = float(flat.pop("__learning_rate__"))

    # Rebuild the params pytree from the flat keys so checkpoint.save
    # writes the exact layout restore() expects.
    n_layers = max(
        int(m.group(1)) for k in flat if (m := re.match(r"lstm/(\d+)/", k))
    ) + 1
    params = {
        "input": {"w": flat["input/w"], "b": flat["input/b"]},
        "lstm": [
            {
                "w_x": flat[f"lstm/{l}/w_x"],
                "w_h": flat[f"lstm/{l}/w_h"],
                "b": flat[f"lstm/{l}/b"],
            }
            for l in range(n_layers)
        ],
        "output": {"w": flat["output/w"], "b": flat["output/b"]},
    }
    return ckpt.save(output_dir, params, step, lr, keep=0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tf_checkpoint", required=True,
                        help="TF checkpoint prefix (…/acousticmodel.ckpt)")
    parser.add_argument("--output_dir", required=True,
                        help="npz checkpoint dir (…/checkpoints/acoustic)")
    args = parser.parse_args(argv)
    path = import_checkpoint(args.tf_checkpoint, args.output_dir)
    print(f"Imported TF checkpoint -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
