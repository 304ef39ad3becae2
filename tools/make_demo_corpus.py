#!/usr/bin/env python
"""Synthesize a LibriSpeech-layout demo corpus (no external data needed).

Writes ``<out>/demo/spk/chap/`` with FLAC clips (distinct tone mixtures +
noise per utterance) and a ``.trans.txt`` transcript file — enough to drive
every CLI mode end-to-end: train until the model memorizes the corpus, then
``--evaluate`` reports 0% WER and ``--file`` reproduces transcripts.

    python tools/make_demo_corpus.py --out data/demo_corpus
    python stt.py --train_acoustic --config <ini pointing at it>

The same recipe (tones coded per transcript) is what the on-hardware
convergence validation in README.md uses.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TEXTS = [
    "HELLO WORLD", "GOOD MORNING", "SPEECH TEST", "OPEN SOURCE",
    "TENSOR CHIP", "AUDIO CLIP", "FAST MODEL", "GREEN TEST",
    "NORTH STAR", "CLEAR VOICE", "QUICK BROWN FOX", "LAZY DOG",
]


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--out", required=True, help="Corpus root directory")
    parser.add_argument("--clips", type=int, default=8,
                        help="Number of utterances (max %d)" % len(DEFAULT_TEXTS))
    parser.add_argument("--seconds", type=float, default=1.0,
                        help="Clip duration (> 0.4: shorter clips are "
                             "dropped by the corpus min-duration filter)")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    if args.seconds <= 0.4:
        parser.error(
            "--seconds must exceed 0.4: the corpus reader drops clips at or "
            "under 0.4 s (the reference's min-audio filter), which would "
            "leave an empty dataset"
        )

    from rnn_speech_tpu.runtime import flac_enc

    root = os.path.join(args.out, "demo", "spk", "chap")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    texts = DEFAULT_TEXTS[: max(1, min(args.clips, len(DEFAULT_TEXTS)))]
    sr = args.sample_rate
    n = int(sr * args.seconds)
    t = np.arange(n)
    lines = []
    for i, text in enumerate(texts):
        utt = f"1-2-{i:04d}"
        # A distinct fundamental per transcript makes the mapping learnable.
        f0 = 200.0 + 50.0 * i
        sig = (
            np.sin(2 * np.pi * f0 * t / sr) * 12000
            + np.sin(2 * np.pi * 2.1 * f0 * t / sr) * 4000
            + rng.normal(0, 500, n)
        ).astype(np.int16)
        flac_enc.encode_flac(os.path.join(root, f"{utt}.flac"), sig, sr)
        lines.append(f"{utt} {text}\n")
    with open(os.path.join(root, "1-2.trans.txt"), "w") as fh:
        fh.writelines(lines)
    print(f"Wrote {len(texts)} clips to {root}")
    print(f"Point training_dataset_dirs/test_dataset_dirs at: "
          f"{os.path.join(args.out, 'demo')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
