"""CLI end-to-end tests: train/file/evaluate/LM/generate over a tiny corpus."""

import os
import subprocess
import sys

import numpy as np
import pytest

from rnn_speech_tpu import audio_io
from rnn_speech_tpu.cli import main, parse_args

CONFIG_TEMPLATE = """
[acoustic_network_params]
num_layers : 1
hidden_size : 24
dropout_input_keep_prob : 1.0
dropout_output_keep_prob : 1.0
batch_size : 2
mini_batch_size : 2
learning_rate : 0.003
lr_decay_factor : 0.33
grad_clip : 5
signal_processing : fbank
language : english
rnn_state_reset_ratio : 1.0

[general]
use_config_file_if_checkpoint_exists : True
steps_per_checkpoint : 2
steps_per_evaluation : 1000
checkpoint_dir : {root}/ckpt

[training]
training_dataset_dirs : {root}/corpus
test_dataset_dirs : {root}/corpus
max_input_seq_length : 120
max_target_seq_length : 40
batch_normalization : False
dataset_size_ordering : False

[logging]
log_level : WARNING

[tpu]
compute_dtype : float32
use_pallas_lstm : False
prefetch_depth : 0
"""


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus_dir = root / "corpus" / "dev"
    corpus_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    texts = ["hey there", "good day", "see you", "all right"]
    for i, text in enumerate(texts):
        n = int(22050 * 0.8)
        sig = (0.3 * np.sin(2 * np.pi * (250 + 120 * i) * np.arange(n) / 22050)
               + 0.01 * rng.normal(size=n)).astype(np.float32)
        wav = str(corpus_dir / f"c{i}.wav")
        audio_io.write_wav(wav, sig, 22050)
        with open(str(corpus_dir / f"c{i}.wav.trn"), "w") as fh:
            fh.write(text.upper() + "\n")
    cfg_path = root / "config.ini"
    cfg_path.write_text(CONFIG_TEMPLATE.format(root=root))
    return root, str(cfg_path)


def test_parse_args_modes():
    prog = parse_args(["--train_acoustic", "--config", "x.ini", "--max_epoch", "3"])
    assert prog["train_acoustic"] and prog["max_epoch"] == 3
    prog = parse_args(["--file", "a.wav", "--beam_width", "4"])
    assert prog["file"] == "a.wav" and prog["beam_width"] == 4
    with pytest.raises(SystemExit):
        parse_args([])  # a mode is required
    with pytest.raises(SystemExit):
        parse_args(["--file", "a.wav", "--evaluate"])  # mutually exclusive


def test_train_acoustic_cli(workdir):
    root, cfg = workdir
    rc = main(["--train_acoustic", "--config", cfg, "--max_steps", "3",
               "--max_epoch", "5"])
    assert rc == 0
    ckpts = os.listdir(str(root / "ckpt" / "acoustic"))
    assert any(name.endswith(".npz") for name in ckpts)
    assert "checkpoint" in ckpts


def test_process_file_cli(workdir, capsys):
    root, cfg = workdir
    wav = str(root / "corpus" / "dev" / "c0.wav")
    rc = main(["--file", wav, "--config", cfg, "--beam_width", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    # Untrained model output may be empty text, but the mode must print a line.
    assert out.endswith("\n")


def test_evaluate_cli(workdir, capsys):
    root, cfg = workdir
    rc = main(["--evaluate", "--config", cfg, "--beam_width", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resulting WER" in out and "Resulting CER" in out


def test_evaluate_cli_many_batches(capsys, tmp_path_factory):
    """More batches than the deferred-drain window (4): the bounded
    trailing drain must score every batch exactly once."""
    root = tmp_path_factory.mktemp("many")
    corpus_dir = root / "corpus" / "dev"
    corpus_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(12):                      # batch 2 -> 6 batches > window
        n = int(22050 * 0.6)
        audio_io.write_wav(str(corpus_dir / f"m{i}.wav"),
                           rng.normal(0, 0.1, n).astype(np.float32), 22050)
        (corpus_dir / f"m{i}.wav.trn").write_text(f"many batch clip {i}\n")
    cfg2 = root / "config.ini"
    cfg2.write_text(CONFIG_TEMPLATE.format(root=root))
    rc = main(["--evaluate", "--config", str(cfg2), "--beam_width", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resulting WER" in out and "Resulting CER" in out


def test_evaluate_cli_sharded_matches_single_device(capsys,
                                                    tmp_path_factory):
    """--evaluate --mesh_data 0 shards batch rows over the 8-device
    virtual mesh; the resulting WER/CER must equal the single-device run
    exactly (decode is row-independent — VERDICT r2 #4)."""
    root = tmp_path_factory.mktemp("shard_eval")
    corpus_dir = root / "corpus" / "dev"
    corpus_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(10):                      # batch 8 -> 2 ragged batches
        n = int(22050 * 0.6)
        sig = (0.3 * np.sin(2 * np.pi * (220 + 90 * i)
                            * np.arange(n) / 22050)
               + 0.01 * rng.normal(size=n)).astype(np.float32)
        audio_io.write_wav(str(corpus_dir / f"s{i}.wav"), sig, 22050)
        (corpus_dir / f"s{i}.wav.trn").write_text(f"shard clip {i}\n")
    cfg2 = root / "config.ini"
    cfg2.write_text(
        CONFIG_TEMPLATE.format(root=root)
        .replace("batch_size : 2", "batch_size : 8")
    )
    # Train a couple of steps so decode runs on non-random weights.
    rc = main(["--train_acoustic", "--config", str(cfg2), "--max_steps", "2"])
    assert rc == 0
    capsys.readouterr()

    outs = {}
    for extra in ([], ["--mesh_data", "0"]):
        rc = main(["--evaluate", "--config", str(cfg2)] + extra)
        assert rc == 0
        outs[bool(extra)] = capsys.readouterr().out
    single = [l for l in outs[False].splitlines() if "Resulting" in l]
    sharded = [l for l in outs[True].splitlines() if "Resulting" in l]
    assert single == sharded and len(single) == 2


def test_evaluate_multiprocess_requires_pod_mesh(workdir, monkeypatch,
                                                 caplog):
    """Multi-process --evaluate with the defaulted (1, 1) mesh must fail
    with an actionable error instead of building a 1-device mesh that
    excludes every other process's devices (whose first collective would
    then hang or crash the pod)."""
    import jax

    root, cfg = workdir
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    rc = main(["--evaluate", "--config", cfg])
    assert rc == 1
    assert any("mesh spanning" in rec.message for rec in caplog.records)


def test_train_language_and_generate_cli(workdir, capsys):
    root, cfg = workdir
    rc = main(["--train_language", "--config", cfg, "--max_steps", "10"])
    assert rc == 0
    assert any(
        name.endswith(".npz")
        for name in os.listdir(str(root / "ckpt" / "language"))
    )
    capsys.readouterr()
    rc = main(["--generate_text", "--config", cfg])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("O")


def test_record_without_pyaudio(workdir):
    root, cfg = workdir
    rc = main(["--record", "--config", cfg])
    assert rc == 1  # graceful gate, not a crash


def test_cli_subprocess_smoke(workdir):
    """The real surface: python stt.py through a subprocess."""
    root, cfg = workdir
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "stt.py"),
         "--evaluate", "--config", cfg, "--beam_width", "1"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Resulting CER" in proc.stdout


def test_train_language_from_text_corpus(workdir, capsys, tmp_path):
    """LM trains from a [lm_network_params] text_corpus file with its own
    architecture, and tools/setup_text_corpus.py builds that file."""
    root, cfg_path = workdir
    corpus_file = tmp_path / "lm_corpus.txt"

    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "setup_text_corpus.py")
    proc = subprocess.run(
        [sys.executable, tool, "--from-datasets", str(root / "corpus"),
         "--output", str(corpus_file)],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    lines = corpus_file.read_text().strip().splitlines()
    assert len(lines) == 4

    cfg2 = tmp_path / "config_lm.ini"
    cfg2.write_text(
        open(cfg_path).read().replace(
            f"checkpoint_dir : {root}/ckpt",
            f"checkpoint_dir : {tmp_path}/ckpt",
        )
        + f"\n[lm_network_params]\nnum_layers : 2\nhidden_size : 16\n"
          f"batch_size : 2\ntext_corpus : {corpus_file}\n"
    )
    rc = main(["--train_language", "--config", str(cfg2), "--max_steps", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Language model trained" in out
    # The checkpoint reflects the LM section's architecture (2x16).
    import numpy as np
    from rnn_speech_tpu.train import checkpoint as ckpt
    path = ckpt.latest_path(str(tmp_path / "ckpt") + "/language/")
    flat = np.load(path)
    gate_shapes = [flat[k].shape for k in flat.files if "w_h" in k]
    assert all(s == (16, 64) for s in gate_shapes) and len(gate_shapes) == 2


def test_file_with_lm_fusion(workdir, capsys, tmp_path):
    """--file with --lm_weight decodes through AM+LM shallow fusion."""
    root, cfg_path = workdir
    # Train a tiny LM so a language checkpoint exists.
    rc = main(["--train_language", "--config", cfg_path, "--max_steps", "2"])
    assert rc == 0
    capsys.readouterr()
    wav = str(root / "corpus" / "dev" / "c0.wav")
    rc = main(["--file", wav, "--config", cfg_path,
               "--beam_width", "4", "--lm_weight", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out
    # The mode must print a decoded-text line (possibly empty/garbage text).
    assert out.endswith("\n")


def test_sweep_tool(workdir, tmp_path):
    """tools/sweep.py runs one training session per grid combination."""
    root, cfg_path = workdir
    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "sweep.py")
    out_dir = tmp_path / "sweep"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, tool, "--config", cfg_path, "--max_steps", "1",
         "--out", str(out_dir),
         "--set", "acoustic_network_params.hidden_size=16,24"],
        capture_output=True, text=True, timeout=900, cwd=repo_root,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    runs = sorted(os.listdir(out_dir))
    assert len(runs) == 2
    for run in runs:
        files = []
        for _, _, names in os.walk(out_dir / run):
            files.extend(names)
        assert any(name.endswith(".npz") for name in files), (run, files)


def test_streaming_transcriber(workdir):
    """The --record engine consumes chunks with persistent state: feeding a
    clip in pieces produces output without crashing, and the recurrent
    state carries across chunk boundaries (state changes between calls)."""
    from rnn_speech_tpu.cli import StreamingTranscriber
    from rnn_speech_tpu.config import load_config

    root, cfg_path = workdir
    config = load_config(cfg_path)
    tr = StreamingTranscriber(config, __import__(
        "rnn_speech_tpu.models.recognizer", fromlist=["SpeechRecognizer"]
    ).SpeechRecognizer("english").get_char_map())

    rng = np.random.default_rng(0)
    sig = (0.3 * np.sin(2 * np.pi * 300 * np.arange(22050) / 22050)
           + 0.01 * rng.normal(size=22050)).astype(np.float32)

    state_before = [np.asarray(c).copy() for c, h in tr._states]
    texts = [tr.feed(sig[:11025]), tr.feed(sig[11025:])]
    state_after = [np.asarray(c) for c, h in tr._states]
    assert all(isinstance(t, str) for t in texts)
    assert any(
        not np.array_equal(b, a) for b, a in zip(state_before, state_after)
    )


def test_train_acoustic_fused_microbatches(workdir, tmp_path_factory):
    """[tpu] fuse_microbatches trains with one fused device batch per step
    (same update cadence, mini_batch_size folded into batch_size)."""
    root, cfg = workdir
    base = open(cfg).read().replace(
        "[tpu]", "[tpu]\nfuse_microbatches : True"
    ).replace(str(root / "ckpt"), str(root / "ckpt_fused"))
    cfg2 = tmp_path_factory.mktemp("fusecfg") / "config.ini"
    cfg2.write_text(base)
    rc = main(["--train_acoustic", "--config", str(cfg2), "--max_steps", "2"])
    assert rc == 0
    names = os.listdir(str(root / "ckpt_fused" / "acoustic"))
    # Step count (and so checkpoint naming) is unchanged by fusion.
    assert "acousticmodel-2.npz" in names


def test_train_and_decode_with_frame_stack(workdir, tmp_path_factory):
    """[tpu] frame_stack = 2 must train, checkpoint, and decode end-to-end
    (same value at train and inference; structural fork keys include it)."""
    root, cfg = workdir
    base = open(cfg).read().replace(
        "[tpu]", "[tpu]\nframe_stack : 2"
    ).replace(str(root / "ckpt"), str(root / "ckpt_stack"))
    cfg2 = tmp_path_factory.mktemp("stackcfg") / "config.ini"
    cfg2.write_text(base)
    rc = main(["--train_acoustic", "--config", str(cfg2), "--max_steps", "2"])
    assert rc == 0
    assert any(
        name.endswith(".npz")
        for name in os.listdir(str(root / "ckpt_stack" / "acoustic"))
    )
    wav = str(root / "corpus" / "dev" / "c0.wav")
    rc = main(["--file", wav, "--config", str(cfg2), "--beam_width", "2"])
    assert rc == 0


def test_effective_batch_shape(tmp_path):
    from rnn_speech_tpu.config import load_config
    from rnn_speech_tpu.train.loop import effective_batch_shape

    base = CONFIG_TEMPLATE.format(root="/tmp/x")
    plain = tmp_path / "plain.ini"
    plain.write_text(base)
    fused = tmp_path / "fused.ini"
    fused.write_text(base.replace("[tpu]", "[tpu]\nfuse_microbatches : True"))
    assert effective_batch_shape(load_config(str(plain))) == (2, 2)
    assert effective_batch_shape(load_config(str(fused))) == (4, 1)


def test_train_acoustic_mesh_from_config(workdir, tmp_path_factory):
    """[tpu] mesh_data in config.ini must shard training without CLI flags
    (conftest provides an 8-device virtual CPU mesh)."""
    root, cfg = workdir
    base = open(cfg).read().replace(
        "[tpu]", "[tpu]\nmesh_data : 2"
    ).replace(str(root / "ckpt"), str(root / "ckpt_mesh"))
    cfg2 = tmp_path_factory.mktemp("meshcfg") / "config.ini"
    cfg2.write_text(base)
    rc = main(["--train_acoustic", "--config", str(cfg2), "--max_steps", "2"])
    assert rc == 0
    assert any(
        name.endswith(".npz")
        for name in os.listdir(str(root / "ckpt_mesh" / "acoustic"))
    )
