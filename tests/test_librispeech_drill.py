"""LibriSpeech readiness drill: the fetch->scan->import->evaluate chain
(tools/librispeech_drill.py) rehearsed against the synthetic
mini-LibriSpeech fixture, so golden parity with the reference's published
weights (/root/reference/trained_models/english/acoustic/README.md:69-81)
is a single command the day real data/weights are reachable."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
))

pytest.importorskip("tensorflow")

import librispeech_drill as drill  # noqa: E402


def test_offline_drill_chain(tmp_path, capsys):
    drill.main(["--root", str(tmp_path), "--clips", "6",
                "--hidden", "32", "--layers", "1"])
    out = capsys.readouterr().out
    assert "scan: 6 clips" in out
    assert "import:" in out and "acousticmodel-1000.npz" in out
    assert "chain OK" in out
    # The imported bundle is the restorable artifact evaluate consumed.
    acoustic_dir = tmp_path / "checkpoints" / "acoustic"
    assert (acoustic_dir / "acousticmodel-1000.npz").exists()
    assert (acoustic_dir / "checkpoint").exists()       # pointer file


def test_lfs_stub_detection(tmp_path):
    stub = tmp_path / "acousticmodel.ckpt.data-00000-of-00001"
    stub.write_bytes(
        b"version https://git-lfs.github.com/spec/v1\noid sha256:ab\n"
    )
    assert drill.is_lfs_stub(str(tmp_path / "acousticmodel.ckpt"))
    real = tmp_path / "real.ckpt.data-00000-of-00001"
    real.write_bytes(b"\x00" * 64)
    assert not drill.is_lfs_stub(str(tmp_path / "real.ckpt"))
