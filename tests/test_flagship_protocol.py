"""Flagship accuracy-run protocol, pinned at toy scale (VERDICT r2 #1).

The real artifact (benchmarks/flagship_accuracy.json) comes from running
tools/flagship_accuracy_run.py at 3x1024 on the TPU chip; this scaled-down
run proves the protocol end-to-end on CPU: ONE continuous training session
(plateau/optimizer state never reset), the loop's own eval cadence, a
char-LM trained on the training transcripts, and a greedy/beam/beam+LM
WER table on the held-out split.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
))


def test_flagship_protocol_toy_scale(tmp_path):
    import flagship_accuracy_run as fr

    bundle = tmp_path / "bundle"
    result = fr.run(
        str(tmp_path), out_path=str(tmp_path / "artifact.json"),
        clips=30, layers=1, hidden=48, batch=8,
        max_steps=20, steps_per_checkpoint=10, lr=4e-3,
        beam_width=2, lm_weight=0.3, lm_steps=10,
        noise_std=400.0, decode_batch=4, artifact_dir=str(bundle),
    )

    # One continuous session: every checkpoint window logged train error,
    # eval error AND the LR — the curves a fragmented protocol cannot
    # produce (each restart would begin a new metrics run).
    curves = result["curves"]
    assert len(curves["train_error_rate"]) == 2      # 20 steps / window 10
    assert len(curves["eval_error_rate"]) == 2
    assert len(curves["learning_rate"]) == 2
    steps = [s for s, _ in curves["train_error_rate"]]
    assert steps == sorted(steps) and steps[-1] == 20

    # The decode table covers all three quality modes over the held-out
    # split, each scoring every held-out clip.
    table = result["wer_table"]
    assert set(table) == {"greedy", "beam2", "beam2_lm"}
    n_test = result["config"]["test"]
    for entry in table.values():
        assert entry["clips"] == n_test
        assert 0.0 <= entry["wer"] <= 100.0
        assert 0.0 <= entry["cer"] <= 100.0

    assert os.path.exists(tmp_path / "artifact.json")
    assert "lr_decays_engaged" in result
    assert set(result["decode_delta_vs_greedy"]) == {"beam2", "beam2_lm"}

    # The exported trained-model bundle is complete and self-describing:
    # both checkpoints resolve through the normal pointer machinery, the
    # hyperparams sidecar reconstructs a Config rooted at the bundle, and
    # the README records the WER table (the reference-bundle analogue,
    # /root/reference/trained_models/english/acoustic/README.md).
    import json

    from rnn_speech_tpu.config import Config
    from rnn_speech_tpu.train import checkpoint as ckpt

    import numpy as np

    for sub in ("acoustic", "language"):
        path = ckpt.latest_path(str(bundle / sub))
        assert path is not None and os.path.getsize(path) > 0
        with np.load(path) as data:
            assert int(data["__step__"]) > 0
            assert float(data["__learning_rate__"]) > 0
            assert any(not k.startswith("__") for k in data.files)
    cfg = Config.from_dict(json.loads((bundle / "hyperparams.json").read_text()))
    assert cfg.checkpoint_dir == str(bundle)
    assert cfg.hidden_size == 48 and cfg.num_layers == 1
    readme = (bundle / "README.md").read_text()
    assert "beam2_lm" in readme and "greedy" in readme
