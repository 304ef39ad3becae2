#!/usr/bin/env python
"""Decode-only beam-vs-greedy quality statistics from the committed bundle.

VERDICT r4 next #3: the flagship artifact's beam-vs-greedy claim rested on
a single informative operating point (sigma=4800: 2 word edits, paired CI
[0.0, 0.78] — touches zero).  This tool densifies the sweep where the
signal lives and scales the held-out split, WITHOUT retraining: it loads
the committed bundle (``trained_models/english-syllables``), generates a
FRESH held-out set (vocabulary sentences the bundle never trained on —
the training texts are reproduced bit-identically from the recorded
corpus seed and excluded), and runs the exact ``decode_table`` protocol
from tools/flagship_accuracy_run.py (paired per-clip bootstrap deltas) at
a sigma grid dense around the WER cliff.

The new clips are statistically legitimate held-out data: sentences are
drawn from the same 2-5-word vocabulary distribution the corpus sampler
uses (tools/make_demo_corpus.sample_sentences), de-duplicated against the
training texts, and rendered with the same clean renderer.

Matches the role of the reference's beam decoder as its default quality
path (/root/reference/models/AcousticModel.py:312) with real statistics.

Usage:
    python tools/beam_quality_run.py --out benchmarks/beam_quality.json \
        --clips 600 --levels 4200,4800,5400,6000
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUNDLE = "trained_models/english-syllables"


def fresh_held_out(bundle_cfg_path: str, n: int, seed: int,
                   train_clips: int, train_test_clips: int, sr: int):
    """n (text, clean_render) pairs disjoint from the bundle's train set.

    The bundle's training texts are reproduced from the recorded corpus
    seed (the same rng call sequence build_corpus uses for its text draw),
    then a fresh stream seeded [seed, "beamq"] draws new distinct
    sentences until n survive the exclusion."""
    import make_demo_corpus as gen

    rng = np.random.default_rng(seed)
    texts = gen.sample_sentences(train_clips + train_test_clips, rng)
    train_texts = set(texts[train_test_clips:])

    rng2 = np.random.default_rng([seed, 0xBEA2])
    out, seen = [], set(texts)      # exclude train AND original held-out
    while len(out) < n:
        for s in gen.sample_sentences(64, rng2):
            if s in seen:
                continue
            seen.add(s)
            out.append(s)
            if len(out) == n:
                break
    assert not (set(out) & train_texts)
    rendered = [(t, gen.render_syllables_clean(t, sr, rng2)) for t in out]
    return rendered


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bundle", default=BUNDLE)
    ap.add_argument("--out", default="benchmarks/beam_quality.json")
    ap.add_argument("--clips", type=int, default=600)
    ap.add_argument("--levels", default="2400,4200,4800,5400,6000")
    ap.add_argument("--decode_batch", type=int, default=20)
    ap.add_argument("--beam_width", type=int, default=16)
    ap.add_argument("--lm_weight", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=0,
                    help="the corpus seed the bundle recorded")
    ap.add_argument("--train_clips", type=int, default=1100)
    ap.add_argument("--train_test_clips", type=int, default=160)
    args = ap.parse_args()

    from flagship_accuracy_run import decode_table, noisy_points

    from rnn_speech_tpu.config import Config
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer
    from rnn_speech_tpu.train.pipeline import PipelineConfig

    with open(os.path.join(args.bundle, "hyperparams.json")) as fh:
        hp = json.load(fh)
    hp["checkpoint_dir"] = args.bundle
    hp["tensorboard_dir"] = ""
    from rnn_speech_tpu.config import LmConfig, TpuConfig

    hp["lm"] = LmConfig(**hp["lm"])
    hp["tpu"] = TpuConfig(**hp["tpu"])
    config = Config(**hp)
    char_map = SpeechRecognizer(config.language).get_char_map()
    sr = PipelineConfig(batch_size=1).sample_rate

    levels = sorted(float(x) for x in args.levels.split(","))
    t0 = time.time()
    held_out = fresh_held_out(args.bundle, args.clips, args.seed,
                              args.train_clips, args.train_test_clips, sr)
    n_words = sum(len(t.split()) for t, _ in held_out)
    print(f"held-out: {len(held_out)} fresh clips, {n_words} words "
          f"({time.time() - t0:.0f}s to render)", flush=True)

    eval_points = noisy_points(held_out, levels, args.seed)
    sweep, paired = decode_table(
        config, char_map, eval_points, args.beam_width, args.lm_weight,
        args.decode_batch,
    )

    significant = {
        lvl: p for lvl, p in paired.items()
        if p["delta_wer_ci95"][0] > 0.0
    }
    significant_lm = {
        lvl: p for lvl, p in paired.items()
        if "lm" in p and p["lm"]["delta_wer_ci95"][0] > 0.0
    }
    result = {
        "task": "decode-only beam-vs-greedy statistics from the committed "
                "bundle on a fresh disjoint held-out set",
        "bundle": args.bundle,
        "clips": len(held_out),
        "n_words": n_words,
        "levels": levels,
        "beam_width": args.beam_width,
        "lm_weight": args.lm_weight,
        "noise_sweep": sweep,
        "beam_vs_greedy_paired": paired,
        "significant_levels": sorted(significant),
        "beam_beats_greedy_significant": bool(significant),
        "significant_levels_lm": sorted(significant_lm),
        "beam_lm_beats_greedy_significant": bool(significant_lm),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: result[k] for k in
                      ("clips", "n_words", "significant_levels",
                       "beam_beats_greedy_significant")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
