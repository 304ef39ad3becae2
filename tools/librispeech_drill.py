#!/usr/bin/env python
"""LibriSpeech readiness drill: fetch -> scan -> import -> evaluate.

The day real LibriSpeech audio and the reference's published weights
(/root/reference/trained_models/english/acoustic/README.md:69-81) are
reachable, golden-transcript parity must be ONE command, not a debugging
session.  This script rehearses the complete chain end-to-end:

  1. fetch   — ``--fetch`` runs tools/prepare_data.sh (the counterpart of
               /root/reference/prepare_data.sh:1-29).  Offline (the
               default) it synthesizes a spec-valid mini-LibriSpeech tree
               (FLAC + ``.trans.txt``, the exact on-disk layout the
               corpus reader auto-detects) with tools/make_demo_corpus.
  2. scan    — rnn_speech_tpu.corpus.DataProcessor over the tree; prints
               clip count and audio hours, fails loudly on an empty scan.
  3. import  — tools/import_tf_checkpoint on ``--tf_checkpoint`` (with
               git-lfs-stub detection: the in-repo reference ckpt is a
               134-byte pointer, not weights).  Offline it WRITES a
               reference-shaped TF Saver checkpoint first (same variable
               names/packing as /root/reference/models/AcousticModel.py
               _add_saving_op) so the real importer code path runs.
  4. evaluate — ``stt.py --evaluate`` through a generated config whose
               checkpoint_dir holds the imported bundle.  Greedy by
               default; ``--beam_width N`` exercises the beam path.

Run offline (CI rehearses this against the synthetic fixture):
  python tools/librispeech_drill.py --root /tmp/drill
Run for real (network + downloaded weights):
  bash tools/prepare_data.sh data
  python tools/librispeech_drill.py --root data --no-synth \\
      --dataset data/LibriSpeech/test-clean \\
      --tf_checkpoint trained_models/english/acoustic/acousticmodel.ckpt
"""

from __future__ import annotations

import argparse
import configparser
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def is_lfs_stub(path: str) -> bool:
    """True if ``path`` (any sibling of the ckpt prefix) is a git-lfs
    pointer file rather than real data."""
    for cand in (path, path + ".data-00000-of-00001", path + ".index"):
        if os.path.isfile(cand):
            with open(cand, "rb") as fh:
                head = fh.read(64)
            return head.startswith(b"version https://git-lfs")
    return False


def synth_corpus(root: str, clips: int, seed: int) -> str:
    """Mini-LibriSpeech tree (FLAC + .trans.txt) via the demo-corpus
    synthesizer; returns the dataset dir to scan."""
    import make_demo_corpus as mdc

    rng = np.random.default_rng(seed)
    texts = mdc.sample_sentences(clips, rng)
    sr = 16000
    sigs = [mdc.render_letters(t, sr, rng) for t in texts]
    mdc.write_corpus(root, texts, sigs, sr)
    return os.path.join(root, "demo")


def scan_corpus(dataset_dir: str) -> None:
    from rnn_speech_tpu import corpus

    files = corpus.DataProcessor(dataset_dir).get_dataset()
    if not files:
        raise SystemExit(f"scan: no usable clips under {dataset_dir}")
    hours = sum(d for _, _, d in files) / 3600.0
    print(f"scan: {len(files)} clips, {hours:.3f} h audio, "
          f"layout ok ({dataset_dir})")


def write_reference_shaped_ckpt(prefix: str, d_in: int, hidden: int,
                                layers: int, labels: int, seed: int) -> str:
    """A TF-Saver checkpoint with the reference's exact variable names and
    BasicLSTMCell [x; h]-row kernel packing (AcousticModel.py:189-317),
    random weights — so the offline drill runs the REAL import path."""
    try:
        import tensorflow as tf  # type: ignore
    except ImportError as exc:
        raise SystemExit(
            "offline drill needs tensorflow's Saver to write the "
            "synthetic reference checkpoint (pip install tensorflow-cpu)"
        ) from exc
    v1 = tf.compat.v1
    rng = np.random.default_rng(seed)
    graph = v1.Graph()
    with graph.as_default():
        v1.get_variable("global_step", initializer=np.int64(1000),
                        trainable=False)
        v1.get_variable("learning_rate", initializer=np.float32(3e-4),
                        trainable=False)
        with v1.variable_scope("Input_Layer"):
            v1.get_variable("input_w", initializer=rng.normal(
                0, 0.2, (d_in, hidden)).astype(np.float32))
            v1.get_variable("input_b", initializer=rng.normal(
                0, 0.05, (hidden,)).astype(np.float32))
        for l in range(layers):
            with v1.variable_scope(
                f"rnn/multi_rnn_cell/cell_{l}/basic_lstm_cell"
            ):
                v1.get_variable("kernel", initializer=rng.normal(
                    0, 0.15, (2 * hidden, 4 * hidden)).astype(np.float32))
                v1.get_variable("bias", initializer=np.zeros(
                    (4 * hidden,), np.float32))
        with v1.variable_scope("Output_layer"):
            v1.get_variable("output_w", initializer=rng.normal(
                0, 0.2, (hidden, labels)).astype(np.float32))
            v1.get_variable("output_b", initializer=np.zeros(
                (labels,), np.float32))
        saver = v1.train.Saver()
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            os.makedirs(os.path.dirname(prefix), exist_ok=True)
            saver.save(sess, prefix)
    return prefix


def run_import(tf_prefix: str, ckpt_dir: str) -> None:
    import import_tf_checkpoint as imp

    path = imp.import_checkpoint(tf_prefix, os.path.join(ckpt_dir,
                                                         "acoustic"))
    print(f"import: {tf_prefix} -> {path}")


def write_config(path: str, dataset_dir: str, ckpt_dir: str, hidden: int,
                 layers: int, max_in: int, batch: int) -> None:
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp.set("training", "training_dataset_dirs", dataset_dir)
    cp.set("training", "test_dataset_dirs", dataset_dir)
    cp.set("training", "max_input_seq_length", str(max_in))
    cp.set("acoustic_network_params", "num_layers", str(layers))
    cp.set("acoustic_network_params", "hidden_size", str(hidden))
    cp.set("acoustic_network_params", "batch_size", str(batch))
    cp.set("general", "checkpoint_dir", ckpt_dir)
    with open(path, "w") as fh:
        cp.write(fh)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", required=True,
                    help="working directory for corpus/ckpt/config")
    ap.add_argument("--fetch", action="store_true",
                    help="run tools/prepare_data.sh (needs network)")
    ap.add_argument("--no-synth", action="store_true",
                    help="do not synthesize a corpus (use --dataset)")
    ap.add_argument("--dataset", default=None,
                    help="existing dataset dir (default: synthesized)")
    ap.add_argument("--tf_checkpoint", default=None,
                    help="real TF ckpt prefix (default: synthesized)")
    ap.add_argument("--clips", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--beam_width", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    os.makedirs(args.root, exist_ok=True)
    if args.fetch:
        subprocess.run(["bash", os.path.join(REPO, "tools",
                                             "prepare_data.sh"),
                        args.root], check=True)

    # 1+2: corpus + scan
    dataset = args.dataset
    if dataset is None:
        if args.no_synth:
            raise SystemExit("--no-synth requires --dataset")
        dataset = synth_corpus(os.path.join(args.root, "corpus"),
                               args.clips, args.seed)
    scan_corpus(dataset)

    # 3: import (real or synthesized reference-shaped ckpt)
    from rnn_speech_tpu.frontend import FBANK_DIM
    from rnn_speech_tpu.charmap import CharMap

    labels = CharMap().num_labels          # default map = english
    tf_prefix = args.tf_checkpoint
    if tf_prefix is not None and is_lfs_stub(tf_prefix):
        raise SystemExit(
            f"{tf_prefix} is a git-lfs POINTER, not weights — run "
            "`git lfs pull` in the reference checkout first"
        )
    if tf_prefix is None:
        tf_prefix = write_reference_shaped_ckpt(
            os.path.join(args.root, "tfckpt", "acousticmodel.ckpt"),
            FBANK_DIM, args.hidden, args.layers, labels, args.seed,
        )
        print(f"import: synthesized reference-shaped ckpt at {tf_prefix}")
    ckpt_dir = os.path.join(args.root, "checkpoints")
    run_import(tf_prefix, ckpt_dir)

    # 4: evaluate through the CLI
    cfg_path = os.path.join(args.root, "drill.ini")
    write_config(cfg_path, dataset, ckpt_dir, args.hidden, args.layers,
                 max_in=400, batch=4)
    cmd = [sys.executable, os.path.join(REPO, "stt.py"), "--evaluate",
           "--config", cfg_path]
    if args.beam_width > 1:
        cmd += ["--beam_width", str(args.beam_width)]
    print("evaluate:", " ".join(cmd))
    res = subprocess.run(cmd, cwd=REPO)
    if res.returncode != 0:
        raise SystemExit(f"evaluate failed with rc={res.returncode}")
    print("drill: fetch->scan->import->evaluate chain OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
