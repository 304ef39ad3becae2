"""Multi-process (pod) training integration: 2 CPU processes x 4 virtual
devices vs one 8-device process.

The reference is strictly single-process (SURVEY §2c); this pins the
TPU-native multi-host contract instead: per-host batch assembly via
``jax.make_array_from_process_local_data``, cross-process gradient psum
through ``shard_map``, process-0-only checkpoint/metrics writes, and the
globally-agreed epoch exit.

The corpus is N copies of ONE clip with one label, so every global batch
has identical rows no matter how the file list is sharded across hosts —
which makes single-process and 2-process losses exactly comparable.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=" + sys.argv[1]
)
import jax
jax.config.update("jax_platforms", "cpu")
mode = sys.argv[2]            # "single" | "0" | "1"
port = sys.argv[3]
out_path = sys.argv[4]
config_path = sys.argv[5]
mesh_model = int(sys.argv[6]) if len(sys.argv) > 6 else 1
if mode != "single":
    jax.distributed.initialize(
        coordinator_address="localhost:" + port,
        num_processes=2,
        process_id=int(mode),
    )
sys.path.insert(0, "__REPO__")
from rnn_speech_tpu.config import load_config
from rnn_speech_tpu.models.recognizer import SpeechRecognizer
from rnn_speech_tpu.parallel import mesh as mesh_mod
from rnn_speech_tpu.train import loop

config = load_config(config_path)
char_map = SpeechRecognizer("english").get_char_map()

def read_set(corpus_dir):
    out = []
    for name in sorted(os.listdir(corpus_dir)):
        if name.endswith(".wav"):
            label = open(
                os.path.join(corpus_dir, name + ".trn")
            ).read().strip()
            out.append([os.path.join(corpus_dir, name), label, 0.4])
    return out

train_set = read_set(config.training_dataset_dirs)
# An ODD-sized test set: the per-host shards get different batch counts,
# exercising the all-padding-batch eval synchronization.
test_set = read_set(config.test_dataset_dirs)
mesh = mesh_mod.make_mesh(0, mesh_model)
hooked = []
state = loop.train_acoustic(
    config, train_set, test_set, char_map, max_steps=2, mesh=mesh,
    step_hook=lambda step, m: hooked.append(
        [step, float(m["mean_loss"]), float(m["mean_error_rate"])]
    ),
)
import numpy as np
# Model-sharded leaves on a pod aren't host-addressable; replicate first
# (a collective — both processes reach this line).
gathered = loop._gatherable_params(state["params"], mesh)
params_sum = float(
    sum(abs(np.asarray(p)).sum() for p in jax.tree.leaves(gathered))
)
with open(out_path, "w") as fh:
    json.dump({
        "steps": hooked,
        "params_sum": params_sum,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }, fh)
"""

CONFIG = """
[acoustic_network_params]
num_layers : 1
hidden_size : 16
dropout_input_keep_prob : 1.0
dropout_output_keep_prob : 1.0
batch_size : 8
mini_batch_size : 1
learning_rate : 0.003
lr_decay_factor : 0.33
grad_clip : 5
signal_processing : fbank
language : english
rnn_state_reset_ratio : 0.0

[general]
use_config_file_if_checkpoint_exists : True
steps_per_checkpoint : 2
steps_per_evaluation : 2
checkpoint_dir : {root}/ckpt_{tag}

[training]
training_dataset_dirs : {root}/corpus
test_dataset_dirs : {root}/test_corpus
max_input_seq_length : 60
max_target_seq_length : 20
batch_normalization : False
dataset_size_ordering : True
tensorboard_dir : {root}/tb_{tag}

[logging]
log_level : WARNING

[tpu]
compute_dtype : float32
use_pallas_lstm : False
use_pallas_ctc : False
prefetch_depth : 0
bucket_count : 1
"""


@pytest.fixture(scope="module")
def mh_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("multihost")
    corpus = root / "corpus"
    corpus.mkdir()
    from rnn_speech_tpu import audio_io

    n = int(22050 * 0.4)
    sig = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 22050)).astype(
        np.float32
    )
    # One clip, copied: identical batch rows under any host sharding.
    for i in range(8):
        path = str(corpus / f"c{i}.wav")
        audio_io.write_wav(path, sig, 22050)
        with open(path + ".trn", "w") as fh:
            fh.write("HELLO WORLD\n")
    # Test corpus of NINE copies: strided host shards get 5 vs 4 clips,
    # so one host runs an extra eval batch and the exhausted host must
    # feed a synchronized all-padding batch.  0.5 s clips: the corpus
    # readers drop audio <= 0.4 s (the reference's min_audio_size filter),
    # and the CLI --evaluate path goes through DataProcessor.
    test_corpus = root / "test_corpus"
    test_corpus.mkdir()
    n2 = int(22050 * 0.5)
    sig2 = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n2) / 22050)).astype(
        np.float32
    )
    for i in range(9):
        path = str(test_corpus / f"t{i}.wav")
        audio_io.write_wav(path, sig2, 22050)
        with open(path + ".trn", "w") as fh:
            fh.write("HELLO WORLD\n")
    child = root / "child.py"
    child.write_text(CHILD.replace("__REPO__", REPO))
    return root, str(child)


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def _run(child, devices, mode, port, out, config, mesh_model=1):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, child, str(devices), mode, str(port), out, config,
         str(mesh_model)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def test_two_process_training_matches_single(mh_root):
    root, child = mh_root
    (root / "tb_single").mkdir()
    (root / "tb_multi").mkdir()
    cfg_single = root / "single.ini"
    cfg_single.write_text(CONFIG.format(root=root, tag="single"))
    cfg_multi = root / "multi.ini"
    cfg_multi.write_text(CONFIG.format(root=root, tag="multi"))

    out_s = str(root / "single.json")
    proc = _run(child, 8, "single", 0, out_s, str(cfg_single))
    _, err = proc.communicate(timeout=420)
    assert proc.returncode == 0, err.decode(errors="replace")[-2000:]

    port = _free_port()
    out0, out1 = str(root / "mh0.json"), str(root / "mh1.json")
    p0 = _run(child, 4, "0", port, out0, str(cfg_multi))
    p1 = _run(child, 4, "1", port, out1, str(cfg_multi))
    _, err0 = p0.communicate(timeout=420)
    _, err1 = p1.communicate(timeout=420)
    assert p0.returncode == 0, err0.decode(errors="replace")[-2000:]
    assert p1.returncode == 0, err1.decode(errors="replace")[-2000:]

    single = json.load(open(out_s))
    mh0 = json.load(open(out0))
    mh1 = json.load(open(out1))
    assert mh0["process_count"] == 2 and mh1["process_count"] == 2

    # Both processes computed identical (psum'd, replicated) metrics.
    np.testing.assert_allclose(mh0["steps"], mh1["steps"], rtol=1e-6)
    np.testing.assert_allclose(mh0["params_sum"], mh1["params_sum"],
                               rtol=1e-6)

    # And they match the single-process 8-device run: same global batch
    # (identical rows), same mesh, same seeds -> same training trajectory.
    s_losses = [row[1] for row in single["steps"]]
    m_losses = [row[1] for row in mh0["steps"]]
    np.testing.assert_allclose(m_losses, s_losses, rtol=1e-4)
    np.testing.assert_allclose(mh0["params_sum"], single["params_sum"],
                               rtol=1e-4)

    # Checkpoints + metrics written exactly once (process 0 only): the
    # multi-run metrics files must mirror the single run's exactly (a
    # second writing process would duplicate lines or add files).
    def metric_files(tag):
        found = []
        for dirpath, _, names in os.walk(str(root / f"tb_{tag}")):
            found.extend(os.path.join(dirpath, n) for n in names)
        return sorted(found)

    files_s, files_m = metric_files("single"), metric_files("multi")
    assert len(files_s) == len(files_m) > 0
    for fs, fm in zip(files_s, files_m):
        # Same payload size (covers the binary .tfevents too): a second
        # writing process would roughly double the multi-run file.
        assert abs(os.path.getsize(fs) - os.path.getsize(fm)) < \
            max(64, 0.2 * os.path.getsize(fs))
    assert os.path.isdir(str(root / "ckpt_multi" / "acoustic"))

    # The in-loop evaluation ran over an odd-sized test set (5-vs-4 host
    # shards -> the exhausted host fed a synchronized all-padding batch)
    # and its pod-psum'd loss must match the single-process value.
    def eval_scalars(files):
        out = []
        for path in files:
            if "tfevents" in os.path.basename(path):
                continue
            for line in open(path):
                rec = json.loads(line)
                if rec.get("tag") == "test/mean_loss":
                    out.append(rec["value"])
        return out

    ev_s, ev_m = eval_scalars(files_s), eval_scalars(files_m)
    assert len(ev_s) == len(ev_m) == 1
    np.testing.assert_allclose(ev_m, ev_s, rtol=1e-4)


def test_two_process_fsdp_training_completes(mh_root):
    """2 processes x 4 devices with mesh_model=8 — a (1, 8) mesh, so every
    gate-weight shard lives on exactly ONE device and neither process can
    address the other's shards.  This forces the FSDP weight all-gathers
    inside the step AND the checkpoint path's params-replication gather —
    a cross-host collective that once deadlocked when only process 0
    launched it.  Both processes must complete and agree on the
    trajectory."""
    root, child = mh_root
    (root / "tb_fsdp").mkdir(exist_ok=True)
    cfg = root / "fsdp.ini"
    cfg.write_text(CONFIG.format(root=root, tag="fsdp"))

    port = _free_port()
    out0, out1 = str(root / "fsdp0.json"), str(root / "fsdp1.json")
    p0 = _run(child, 4, "0", port, out0, str(cfg), mesh_model=8)
    p1 = _run(child, 4, "1", port, out1, str(cfg), mesh_model=8)
    _, err0 = p0.communicate(timeout=420)
    _, err1 = p1.communicate(timeout=420)
    assert p0.returncode == 0, err0.decode(errors="replace")[-2000:]
    assert p1.returncode == 0, err1.decode(errors="replace")[-2000:]

    mh0, mh1 = json.load(open(out0)), json.load(open(out1))
    np.testing.assert_allclose(mh0["steps"], mh1["steps"], rtol=1e-5)
    np.testing.assert_allclose(mh0["params_sum"], mh1["params_sum"],
                               rtol=1e-5)
    # The checkpoint was written (by process 0) from gathered params.
    ckpts = os.listdir(str(root / "ckpt_fsdp" / "acoustic"))
    assert any(name.endswith(".npz") for name in ckpts)


EVAL_CHILD = """
import os, sys, json, io, contextlib
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=" + sys.argv[1]
)
mode = sys.argv[2]            # "single" | "0" | "1"
port = sys.argv[3]
out_path = sys.argv[4]
config_path = sys.argv[5]
if mode != "single":
    os.environ["RST_MULTIHOST"] = "1"
    os.environ["RST_COORD_ADDR"] = "localhost:" + port
    os.environ["RST_NUM_PROCESSES"] = "2"
    os.environ["RST_PROCESS_ID"] = mode
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "__REPO__")
from rnn_speech_tpu import cli

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    rc = cli.main(["--evaluate", "--config", config_path,
                   "--mesh_data", "0"])
with open(out_path, "w") as fh:
    json.dump({"rc": rc, "out": buf.getvalue(),
               "process_index": jax.process_index()}, fh)
"""


def test_two_process_cli_evaluate_matches_single(mh_root):
    """--evaluate on a 2-process pod: each host decodes its shard of the
    odd-sized test corpus (5-vs-4 clips -> the exhausted host feeds
    all-padding lockstep batches), the WER/CER sums allgather, and ONLY
    process 0 prints — with exactly the single-process numbers
    (VERDICT r2 #4)."""
    root, _ = mh_root
    eval_child = root / "eval_child.py"
    eval_child.write_text(EVAL_CHILD.replace("__REPO__", REPO))
    (root / "tb_eval").mkdir(exist_ok=True)
    cfg = root / "eval.ini"
    cfg.write_text(CONFIG.format(root=root, tag="eval"))

    out_s = str(root / "eval_single.json")
    proc = _run(str(eval_child), 8, "single", 0, out_s, str(cfg))
    _, err = proc.communicate(timeout=420)
    assert proc.returncode == 0, err.decode(errors="replace")[-2000:]

    port = _free_port()
    out0, out1 = str(root / "eval0.json"), str(root / "eval1.json")
    p0 = _run(str(eval_child), 4, "0", port, out0, str(cfg))
    p1 = _run(str(eval_child), 4, "1", port, out1, str(cfg))
    _, err0 = p0.communicate(timeout=420)
    _, err1 = p1.communicate(timeout=420)
    assert p0.returncode == 0, err0.decode(errors="replace")[-2000:]
    assert p1.returncode == 0, err1.decode(errors="replace")[-2000:]

    single = json.load(open(out_s))
    mh0, mh1 = json.load(open(out0)), json.load(open(out1))
    assert single["rc"] == mh0["rc"] == mh1["rc"] == 0
    assert "Resulting WER" in single["out"]
    # Process 0 prints the single-process numbers; process 1 stays silent.
    assert mh0["out"] == single["out"]
    assert mh1["out"] == ""
