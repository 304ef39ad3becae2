"""Loop policies, metrics writer, WER/CER, recognizer wrapper."""

import json

import numpy as np
import pytest

from rnn_speech_tpu.train.loop import PlateauPolicy, reset_coin
from rnn_speech_tpu.train.metrics import (
    MetricsWriter,
    calculate_cer,
    calculate_wer,
)


# ------------------------------------------------------------ plateau policy

def test_plateau_decays_after_seven_strikes():
    p = PlateauPolicy(0.33)
    assert p.update(1.0) is False          # first entry (also the best)
    decayed = [p.update(1.0 + i * 0.01) for i in range(1, 7)]
    # 7th non-improving entry triggers the decay.
    assert decayed == [False] * 5 + [True]
    assert p.history == []                 # cleared after decay


def test_plateau_clears_on_improvement():
    p = PlateauPolicy(0.33)
    for _ in range(5):
        p.update(1.0)
    assert p.update(0.5) is False          # improvement clears history
    assert len(p.history) == 1


def test_reset_coin_distribution():
    np.random.seed(0)
    import random

    random.seed(0)
    draws = [reset_coin(1.0) for _ in range(100)]
    assert all(draws)                      # ratio 1.0 -> always reset
    draws = [reset_coin(0.25) for _ in range(4000)]
    assert 0.15 < np.mean(draws) < 0.35    # ~25%


# ---------------------------------------------------------------- metrics IO

def test_metrics_writer_scalars_and_histograms(tmp_path):
    w = MetricsWriter(str(tmp_path), "run1")
    w.add_scalar("loss", 1.5, step=10)
    w.add_histogram("weights", np.arange(100.0), step=10)
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[0]["kind"] == "scalar" and lines[0]["value"] == 1.5
    hist = lines[1]
    assert hist["kind"] == "histogram"
    assert hist["min"] == 0.0 and hist["max"] == 99.0
    assert sum(hist["counts"]) == 100


def test_metrics_writer_appends(tmp_path):
    w1 = MetricsWriter(str(tmp_path), "run")
    w1.add_scalar("a", 1.0, 1)
    w1.close()
    w2 = MetricsWriter(str(tmp_path), "run")
    w2.add_scalar("a", 2.0, 2)
    w2.close()
    assert len(open(w2.path).readlines()) == 2


# ------------------------------------------------------------------- WER/CER

def test_wer_reference_examples():
    assert calculate_wer("who is there", "is there") == 1
    assert calculate_wer("who is there", "") == 3
    assert calculate_wer("", "who is there") == 3


def test_cer_reference_examples():
    assert calculate_cer("who is there", "whois there") == 0
    assert calculate_cer("who is there", "who i thre") == 2
    assert calculate_cer("", "who is there") == 10


# ------------------------------------------------------------- recognizer

def test_recognizer_language_gate():
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer

    reco = SpeechRecognizer("english")
    assert reco.get_char_map_length() == 80
    with pytest.raises(ValueError):
        SpeechRecognizer("klingon")


def test_recognizer_split_policies(tmp_path):
    from rnn_speech_tpu import audio_io
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer

    dev = tmp_path / "corpus" / "dev"
    dev.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        n = int(22050 * (0.5 + 0.1 * i))
        audio_io.write_wav(str(dev / f"c{i}.wav"),
                           rng.normal(0, 0.1, n).astype(np.float32), 22050)
        (dev / f"c{i}.wav.trn").write_text(f"sample number {i}\n")

    # Ordered: ascending duration.
    train, test = SpeechRecognizer.load_acoustic_dataset(
        str(tmp_path / "corpus"), ordered=True
    )
    durations = [item[2] for item in train]
    assert durations == sorted(durations)
    assert test == []

    # train_frac split.
    train, test = SpeechRecognizer.load_acoustic_dataset(
        str(tmp_path / "corpus"), train_frac=0.5
    )
    assert len(train) == 3 and len(test) == 3

    # Separate test dirs.
    train, test = SpeechRecognizer.load_acoustic_dataset(
        str(tmp_path / "corpus"), test_dataset_dirs=str(tmp_path / "corpus")
    )
    assert len(test) == 6


def test_step_hook_sees_every_step_once_in_order(tmp_path):
    """The pipelined (one-step-deferred) metric drain must still deliver
    step_hook exactly once per step, in order, with finite metrics —
    including the window tail."""
    from rnn_speech_tpu import audio_io
    from rnn_speech_tpu.config import load_config
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer
    from rnn_speech_tpu.train import loop

    dev = tmp_path / "corpus" / "dev"
    dev.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        audio_io.write_wav(str(dev / f"c{i}.wav"),
                           rng.normal(0, 0.1, 11025).astype(np.float32), 22050)
        (dev / f"c{i}.wav.trn").write_text(f"sample number {i}\n")
    cfg_file = tmp_path / "config.ini"
    cfg_file.write_text(f"""
[acoustic_network_params]
num_layers : 1
hidden_size : 16
dropout_input_keep_prob : 1.0
dropout_output_keep_prob : 1.0
batch_size : 2
mini_batch_size : 1
learning_rate : 0.001
lr_decay_factor : 0.33
grad_clip : 5
signal_processing : fbank
language : english
rnn_state_reset_ratio : 1.0
[general]
use_config_file_if_checkpoint_exists : True
steps_per_checkpoint : 3
steps_per_evaluation : 3
checkpoint_dir : {tmp_path}/ckpt
[training]
training_dataset_dirs : {tmp_path}/corpus
max_input_seq_length : 60
max_target_seq_length : 30
[logging]
log_level : WARNING
[tpu]
compute_dtype : float32
use_pallas_lstm : False
use_pallas_ctc : False
prefetch_depth : 0
""")
    config = load_config(str(cfg_file))
    reco = SpeechRecognizer("english")
    train_set, _ = reco.load_acoustic_dataset(str(tmp_path / "corpus"))
    seen = []
    # Passing the corpus as the test set also exercises evaluate_dataset
    # (steps_per_evaluation == steps_per_checkpoint fires it each window).
    loop.train_acoustic(
        config, train_set, list(train_set), reco.get_char_map(),
        max_steps=7,    # not a multiple of steps_per_checkpoint: tests tail
        step_hook=lambda step, m: seen.append(
            (step, float(m["mean_loss"]))
        ),
    )
    assert [s for s, _ in seen] == list(range(1, 8))
    assert all(np.isfinite(v) for _, v in seen)


def test_truncated_window_mean_is_unbiased(tmp_path):
    """A checkpoint window truncated by max_steps must log (and feed the
    plateau policy) the mean over the steps that actually ran — not the
    sum divided by steps_per_checkpoint, which biased the window mean low
    by steps_run/steps_per_checkpoint (VERDICT r2 #5)."""
    from rnn_speech_tpu import audio_io
    from rnn_speech_tpu.config import load_config
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer
    from rnn_speech_tpu.train import loop

    dev = tmp_path / "corpus" / "dev"
    dev.mkdir(parents=True)
    (tmp_path / "tb").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        audio_io.write_wav(str(dev / f"c{i}.wav"),
                           rng.normal(0, 0.1, 11025).astype(np.float32), 22050)
        (dev / f"c{i}.wav.trn").write_text(f"sample number {i}\n")
    cfg_file = tmp_path / "config.ini"
    cfg_file.write_text(f"""
[acoustic_network_params]
num_layers : 1
hidden_size : 16
dropout_input_keep_prob : 1.0
dropout_output_keep_prob : 1.0
batch_size : 2
mini_batch_size : 1
learning_rate : 0.001
lr_decay_factor : 0.33
grad_clip : 5
signal_processing : fbank
language : english
rnn_state_reset_ratio : 1.0
[general]
use_config_file_if_checkpoint_exists : True
steps_per_checkpoint : 5
steps_per_evaluation : 0
checkpoint_dir : {tmp_path}/ckpt
[training]
training_dataset_dirs : {tmp_path}/corpus
tensorboard_dir : {tmp_path}/tb
max_input_seq_length : 60
max_target_seq_length : 30
[logging]
log_level : WARNING
[tpu]
compute_dtype : float32
use_pallas_lstm : False
use_pallas_ctc : False
prefetch_depth : 0
""")
    config = load_config(str(cfg_file))
    reco = SpeechRecognizer("english")
    train_set, _ = reco.load_acoustic_dataset(str(tmp_path / "corpus"))
    per_step = []
    # max_steps=7: window 1 runs 5 steps, window 2 is truncated at 2.
    loop.train_acoustic(
        config, train_set, [], reco.get_char_map(),
        max_steps=7, tb_name="run",
        step_hook=lambda step, m: per_step.append(
            float(m["mean_error_rate"])
        ),
    )
    assert len(per_step) == 7
    lines = [json.loads(l)
             for l in open(tmp_path / "tb" / "run" / "events.jsonl")]
    window_means = [l["value"] for l in lines
                    if l["tag"] == "train/mean_error_rate"]
    assert len(window_means) == 2
    np.testing.assert_allclose(window_means[0], np.mean(per_step[:5]),
                               rtol=1e-6)
    np.testing.assert_allclose(window_means[1], np.mean(per_step[5:]),
                               rtol=1e-6)


def test_sweep_tool_dry_run(tmp_path):
    import subprocess
    import sys

    cfg = tmp_path / "config.ini"
    cfg.write_text(
        "[acoustic_network_params]\nnum_layers : 1\n"
        "[general]\ncheckpoint_dir : x\n[training]\n[logging]\n"
    )
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo_root, "tools", "sweep.py"),
         "--config", str(cfg),
         "--out", str(tmp_path / "runs"), "--dry_run",
         "--set", "acoustic_network_params.num_layers=1,2"],
        capture_output=True, text=True, cwd=repo_root,
    )
    assert proc.returncode == 0, proc.stderr
    assert "num_layers-1" in proc.stdout and "num_layers-2" in proc.stdout
    assert (tmp_path / "runs" / "num_layers-2" / "config.ini").exists()


def test_tbevents_readable_by_tensorboard(tmp_path):
    """Our hand-rolled .tfevents records parse with TensorBoard's loader
    (CRC32C framing + Event/Summary/Histogram protos)."""
    pytest.importorskip("tensorboard.backend.event_processing")
    from tensorboard.backend.event_processing import event_file_loader

    from rnn_speech_tpu.train.tbevents import TBEventWriter

    w = TBEventWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.25, step=7)
    w.add_scalar("learning_rate", 3e-4, step=7)
    rng = np.random.default_rng(0)
    w.add_histogram("rnn/layer0_cell", rng.normal(0, 1, 512), step=7)
    w.close()

    loader = event_file_loader.EventFileLoader(w.path)
    events = list(loader.Load())
    assert events[0].file_version == "brain.Event:2"
    # The loader's data-compat layer migrates legacy simple_value/histo
    # fields into tensors; read the migrated form.
    scalars = {}
    histos = {}
    for e in events:
        for v in e.summary.value:
            if v.metadata.plugin_data.plugin_name == "scalars":
                scalars[v.tag] = (e.step, v.tensor.float_val[0])
            elif v.metadata.plugin_data.plugin_name == "histograms":
                histos[v.tag] = e.step
    assert scalars["train/loss"] == (7, 1.25)
    step, lr = scalars["learning_rate"]
    assert step == 7 and abs(lr - 3e-4) < 1e-9
    assert histos == {"rnn/layer0_cell": 7}
