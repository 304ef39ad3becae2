"""Held-out generalization: the framework learns speech-like mappings it
was never shown (VERDICT r1 #3 — accuracy evidence beyond memorization).

A scaled-down version of tools/accuracy_benchmark.py: train on sentences
from the letters corpus (every character a distinct tone), evaluate WER on
UNSEEN sentences.  Slow (~minutes on CPU) but the one test that proves
the training system generalizes; the committed benchmarks/accuracy_curve
artifact records the full-size run.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
))


def test_heldout_wer_improves_and_beats_threshold(tmp_path):
    import accuracy_benchmark as ab

    result = ab.run(
        str(tmp_path), out_path=None, clips=60, layers=1, hidden=96,
        batch=8, rounds=6, steps=120, wer_target=35.0, seed=0, lr=4e-3,
    )
    curve = result["curve"]
    assert len(curve) >= 2
    # Held-out WER must actually improve over training...
    assert curve[-1]["wer"] < curve[0]["wer"]
    # ...and reach the (generous, scaled-down) target on sentences the
    # model never saw.
    assert result["reached_target"], curve
