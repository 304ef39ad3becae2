"""Flagship accuracy-run protocol, pinned at toy scale (VERDICT r2 #1,
round-4 SNR-sweep/bundle-decode revision per VERDICT r3 #1/#5).

The real artifact (benchmarks/flagship_accuracy.json) comes from running
tools/flagship_accuracy_run.py at 3x1024 on the TPU chip; this scaled-down
run proves the protocol end-to-end on CPU: ONE continuous training session
(plateau/optimizer state never reset), the loop's own eval cadence, a
char-LM trained on the training transcripts, the trained-bundle export
(bf16), an SNR-sweep greedy/beam/beam+LM WER table decoded FROM the
bundle with word counts + bootstrap CIs + paired beam-vs-greedy deltas,
and a chunked-vs-one-shot streaming agreement table.
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
        clips=24, test_clips=6, layers=1, hidden=48, batch=8,
        max_steps=20, steps_per_checkpoint=10, lr=4e-3,
        beam_width=2, lm_weight=0.3, lm_steps=10,
        train_noise=(200.0, 800.0), eval_noise_levels=(300.0, 600.0),
        decode_batch=4, artifact_dir=str(bundle),
        streaming_chunk_seconds=(0.5,), streaming_max_clips=3,
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

    # The sweep decodes all three quality modes at every noise level,
    # each scoring every held-out clip, with counts and CIs recorded.
    assert set(result["noise_sweep"]) == {"300.0", "600.0"}
    for table in result["noise_sweep"].values():
        assert set(table) == {"greedy", "beam2", "beam2_lm"}
        for entry in table.values():
            assert entry["clips"] == 6
            assert 0.0 <= entry["wer"] <= 100.0
            assert 0.0 <= entry["cer"] <= 100.0
            assert entry["n_words"] >= 2 * entry["clips"]
            assert entry["word_edits"] >= 0
            lo, hi = entry["wer_ci95"]
            assert lo <= entry["wer"] <= hi
    # Headline table = the middle sweep level (here the upper of two).
    assert result["headline_noise_std"] == 600.0
    assert result["wer_table"] == result["noise_sweep"]["600.0"]
    assert set(result["beam_vs_greedy_paired"]) == {"300.0", "600.0"}
    for rec in result["beam_vs_greedy_paired"].values():
        lo, hi = rec["delta_wer_ci95"]
        assert lo <= rec["delta_wer"] <= hi

    assert os.path.exists(tmp_path / "artifact.json")
    assert "lr_decays_engaged" in result
    assert set(result["decode_delta_vs_greedy"]) == {"beam2", "beam2_lm"}
    assert set(result["beam_improves_beyond_floor"]) == {"300.0", "600.0"}

    # Streaming section: chunked-vs-one-shot agreement on the bundle.
    streaming = result["streaming"]
    assert "greedy" in streaming and "beam2_lm" in streaming
    for mode in streaming.values():
        rec = mode["chunks"]["0.5"]
        assert rec["clips"] == 3
        assert 0.0 <= rec["agreement_pct"] <= 100.0

    # The exported trained-model bundle is complete and self-describing:
    # both checkpoints resolve through the normal pointer machinery as
    # bf16 bundles, the hyperparams sidecar reconstructs a Config rooted
    # at the bundle, and the README records the sweep (the
    # reference-bundle analogue,
    # /root/reference/trained_models/english/acoustic/README.md).
    import json

    import numpy as np

    from rnn_speech_tpu.config import Config
    from rnn_speech_tpu.train import checkpoint as ckpt

    for sub in ("acoustic", "language"):
        path = ckpt.latest_path(str(bundle / sub))
        assert path is not None and os.path.getsize(path) > 0
        with np.load(path) as data:
            assert int(data["__step__"]) > 0
            assert float(data["__learning_rate__"]) > 0
            assert ckpt.BF16_KEYS in data.files       # committed as bf16
            assert any(not k.startswith("__") for k in data.files)
    cfg = Config.from_dict(json.loads((bundle / "hyperparams.json").read_text()))
    assert cfg.checkpoint_dir == str(bundle)
    assert cfg.hidden_size == 48 and cfg.num_layers == 1
    readme = (bundle / "README.md").read_text()
    assert "beam2_lm" in readme and "greedy" in readme
    assert "word edits" in readme


def test_export_weights_refuses_empty_bundle(tmp_path):
    """ADVICE r3: a weights-free bundle must raise, not print success."""
    import flagship_accuracy_run as fr
    import pytest

    from rnn_speech_tpu.config import Config

    config = Config(checkpoint_dir=str(tmp_path / "nonexistent"))
    with pytest.raises(RuntimeError, match="weights-free"):
        fr.export_weights(str(tmp_path / "bundle"), config)


def test_flagship_protocol_resume_after_crash(tmp_path):
    """Crash recovery for the multi-stage protocol (the r4 flagship run
    trained 3000 steps on the chip, then died in decode_table on a config
    skew — the ~30 min of training must be recoverable).  --resume skips
    training, replays the corpus rng bit-identically, reuses the
    checkpoints + curves under --workdir, and may EXTEND the sweep: the
    common levels must reproduce the original decode exactly (same
    weights, same renders, level-keyed noise rng)."""
    import json

    import flagship_accuracy_run as fr

    bundle = tmp_path / "bundle"
    kw = dict(
        clips=16, test_clips=4, layers=1, hidden=32, batch=8,
        max_steps=10, steps_per_checkpoint=5, lr=4e-3,
        beam_width=2, lm_weight=0.3, lm_steps=5,
        train_noise=(200.0, 800.0),
        decode_batch=4, artifact_dir=str(bundle), run_streaming=False,
    )
    first = fr.run(str(tmp_path), out_path=None,
                   eval_noise_levels=(300.0, 600.0), **kw)

    out = tmp_path / "resumed.json"
    resumed = fr.run(str(tmp_path), out_path=str(out),
                     eval_noise_levels=(300.0, 600.0, 1200.0),
                     headline_noise=600.0, resume=True, **kw)

    # Training was skipped, curves reread from the original session.
    assert resumed["curves"] == first["curves"]
    assert resumed["lr_decays_engaged"] == first["lr_decays_engaged"]
    assert resumed["config"]["train_seconds"] > 0
    # Common sweep levels decode identically (same weights, same renders,
    # level-keyed noise rng); only the wall-time field may differ.
    def _strip_times(table):
        return {mode: {k: v for k, v in entry.items()
                       if k != "decode_seconds"}
                for mode, entry in table.items()}

    for level in ("300.0", "600.0"):
        assert _strip_times(resumed["noise_sweep"][level]) == \
            _strip_times(first["noise_sweep"][level])
    assert set(resumed["noise_sweep"]) == {"300.0", "600.0", "1200.0"}
    # Headline pinned by --headline_noise, not the (shifted) middle.
    assert resumed["headline_noise_std"] == 600.0
    assert resumed["wer_table"] == resumed["noise_sweep"]["600.0"]
    assert json.loads(out.read_text())["noise_sweep"].keys() == \
        resumed["noise_sweep"].keys()
