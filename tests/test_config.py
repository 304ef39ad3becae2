"""Config parsing + hyperparameter fork-or-restore semantics."""

import json
import os

import pytest

from rnn_speech_tpu.config import Config, HyperParamStore, load_config

INI = """
[acoustic_network_params]
num_layers : 3
hidden_size : 1024
dropout_input_keep_prob : 0.8
dropout_output_keep_prob : 0.5
batch_size : 10
mini_batch_size : 3
learning_rate : 0.0003
lr_decay_factor : 0.33
grad_clip : 1
signal_processing : fbank
language : english
rnn_state_reset_ratio : 0.25

[general]
use_config_file_if_checkpoint_exists : True
steps_per_checkpoint : 100
steps_per_evaluation : 1000
checkpoint_dir : {ckpt}

[training]
training_dataset_dirs : data/a, data/b
max_input_seq_length : 3510
max_target_seq_length : 600
batch_normalization : False
dataset_size_ordering : False

[logging]
log_level : INFO
"""


@pytest.fixture
def ini_path(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(INI.format(ckpt=tmp_path / "ckpt"))
    return str(path)


def test_load_config(ini_path):
    cfg = load_config(ini_path)
    assert cfg.num_layers == 3
    assert cfg.hidden_size == 1024
    assert cfg.signal_processing == "fbank"
    assert cfg.input_dim == 120
    assert cfg.grad_clip == 1.0
    assert cfg.train_frac is None
    assert cfg.test_dataset_dirs is None
    assert cfg.tensorboard_dir is None
    assert cfg.training_dataset_dirs == "data/a, data/b"
    assert cfg.tpu.compute_dtype == "bfloat16"


def test_input_dim_mfcc():
    assert Config(signal_processing="mfcc").input_dim == 20


def test_missing_config_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "nope.ini"))


def test_tpu_section(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(
        INI.format(ckpt=tmp_path / "ckpt")
        + "\n[tpu]\nmesh_data : 4\ncompute_dtype : float32\nuse_pallas_lstm : False\n"
    )
    cfg = load_config(str(path))
    assert cfg.tpu.mesh_data == 4
    assert cfg.tpu.compute_dtype == "float32"
    assert cfg.tpu.use_pallas_lstm is False


def test_store_fresh_checkpoint(tmp_path, ini_path):
    cfg = load_config(ini_path)
    store = HyperParamStore(cfg)
    assert store.config == cfg
    assert os.path.exists(store.path)


def test_store_no_structural_change(ini_path):
    cfg = load_config(ini_path)
    HyperParamStore(cfg)
    store2 = HyperParamStore(cfg.replace(learning_rate=0.1))
    # Non-structural change: same dir, config file wins.
    assert store2.config.learning_rate == 0.1
    assert store2.config.checkpoint_dir == cfg.checkpoint_dir


def test_store_structural_change_forks(ini_path):
    cfg = load_config(ini_path)
    HyperParamStore(cfg)
    store2 = HyperParamStore(cfg.replace(hidden_size=2048))
    # use_config_file_if_checkpoint_exists=True -> fork a new timestamped dir.
    assert store2.config.checkpoint_dir != cfg.checkpoint_dir
    assert store2.config.checkpoint_dir.startswith(cfg.checkpoint_dir)
    assert store2.config.hidden_size == 2048
    with open(store2.path) as fh:
        assert json.load(fh)["hidden_size"] == 2048


def test_store_structural_change_restores_old(ini_path):
    cfg = load_config(ini_path)
    HyperParamStore(cfg)
    newcfg = cfg.replace(
        hidden_size=2048, use_config_file_if_checkpoint_exists=False
    )
    store2 = HyperParamStore(newcfg)
    # Old snapshot wins wholesale.
    assert store2.config.hidden_size == cfg.hidden_size
    assert store2.config.checkpoint_dir == cfg.checkpoint_dir


def test_config_dict_roundtrip():
    cfg = Config(num_layers=7, hidden_size=512)
    assert Config.from_dict(cfg.to_dict()) == cfg


def test_lm_section(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(
        INI.format(ckpt=tmp_path / "ckpt")
        + "\n[lm_network_params]\nnum_layers : 3\nhidden_size : 34\n"
        "dropout : 0.9\nbatch_size : 1\nlearning_rate : 1e-5\n"
        "lr_decay_factor : 0.97\ngrad_clip : 5\ntext_corpus : data/lm.txt\n"
    )
    cfg = load_config(str(path))
    assert cfg.lm.num_layers == 3 and cfg.lm.hidden_size == 34
    assert cfg.lm.dropout_keep_prob == 0.9
    assert cfg.lm.learning_rate == 1e-5
    assert cfg.lm.text_corpus == "data/lm.txt"
    resolved = cfg.lm_resolved()
    assert resolved.num_layers == 3           # explicit LM value wins
    assert resolved.grad_clip == 5.0


def test_lm_section_inherits_acoustic(ini_path):
    cfg = load_config(ini_path)
    resolved = cfg.lm_resolved()
    assert resolved.num_layers == cfg.num_layers
    assert resolved.hidden_size == cfg.hidden_size
    assert resolved.learning_rate == cfg.learning_rate
    assert resolved.batch_size == cfg.batch_size


def test_lm_explicit_zero_not_inherited(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(
        INI.format(ckpt=tmp_path / "ckpt")
        + "\n[lm_network_params]\ngrad_clip : 0\n"
    )
    cfg = load_config(str(path))
    assert cfg.lm_resolved().grad_clip == 0.0   # not the acoustic 1.0


def test_reference_english_preset_loads_published_protocol():
    """The shipped preset must parse AND preserve the reference's exact
    published training protocol: 3x1024 fbank, dropout 0.8/0.5, batch
    10x3 run as SEQUENTIAL microbatches (fuse_microbatches off here so
    reproductions carry the published recurrent-state/batch-norm
    semantics; the TPU-tuned config.ini keeps fusion on), grad_clip 1,
    lr 3e-4 with x0.33 plateau decay, max lens 3510/600."""
    import os

    from rnn_speech_tpu.config import load_config

    preset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "reference_english.ini",
    )
    config = load_config(preset)
    assert (config.num_layers, config.hidden_size) == (3, 1024)
    assert config.signal_processing == "fbank"
    assert (config.dropout_input_keep_prob,
            config.dropout_output_keep_prob) == (0.8, 0.5)
    assert (config.batch_size, config.mini_batch_size) == (10, 3)
    assert config.tpu.fuse_microbatches is False
    assert (config.learning_rate, config.lr_decay_factor,
            config.grad_clip) == (3e-4, 0.33, 1.0)
    assert (config.max_input_seq_length,
            config.max_target_seq_length) == (3510, 600)

    repo_cfg = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config.ini",
    ))
    assert repo_cfg.tpu.fuse_microbatches is True
