"""Language-model training loop with the acoustic loop's policies.

The reference's ``--train_language`` never got a loop at all — its
``train_language_rnn`` builds the graph and returns immediately
(/root/reference/stt.py:159-168).  Round 1 shipped a smoke-level trainer
(ordered cycling over a Python list, one checkpoint at the end); this
module promotes it to full parity with the acoustic loop
(rnn_speech_tpu/train/loop.py): shuffled length-batched epochs over the
text corpus, checkpoint cadence, held-out perplexity evaluation, plateau
LR decay with the reference's exact accounting, metrics writing, and
resume-from-checkpoint (VERDICT r1 #5).
"""

from __future__ import annotations

import logging
from random import Random
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnn_speech_tpu.config import Config
from rnn_speech_tpu.models import language
from rnn_speech_tpu.train import checkpoint as ckpt
from rnn_speech_tpu.train import metrics as metrics_mod
from rnn_speech_tpu.train import optim
from rnn_speech_tpu.train.loop import MIN_LEARNING_RATE, PlateauPolicy

logger = logging.getLogger(__name__)


def split_texts(texts: List[str], train_frac: float = 0.95,
                min_eval: int = 1) -> Tuple[List[str], List[str]]:
    """Deterministic train/held-out split (the acoustic ``train_frac``
    policy applied to the text corpus).  Tiny corpora still get at least
    ``min_eval`` eval sentences so perplexity is always defined."""
    texts = list(texts)
    if len(texts) < 2:
        return texts, []
    n_train = int(len(texts) * train_frac)
    n_train = min(max(n_train, 1), len(texts) - min_eval)
    return texts[:n_train], texts[n_train:]


class TextBatcher:
    """Shuffled, length-ordered (T, B) id batches from a text list.

    Epoch protocol mirrors the acoustic pipeline: shuffle the corpus each
    epoch, then sort within shuffle windows by length so batch rows pad
    similarly (the bucketing complement of ``order_by_duration``).  Short
    final batches pad with zero-length rows, which the masked loss
    ignores."""

    def __init__(self, texts: List[str], char_map, max_len: int,
                 batch_size: int, seed: int = 0, shuffle: bool = True):
        self.encoded = [
            ids[: max_len]
            for ids in (char_map.encode(t, add_eos=True) for t in texts)
            if len(ids) >= 2           # need >= 1 next-char prediction
        ]
        self.max_len = max_len
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = Random(seed)

    def __len__(self) -> int:
        return len(self.encoded)

    def epoch(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = list(range(len(self.encoded)))
        if self.shuffle:
            self.rng.shuffle(order)
        window = self.batch_size * 16
        B = self.batch_size
        for w in range(0, len(order), window):
            chunk = sorted(order[w : w + window],
                           key=lambda i: len(self.encoded[i]))
            for b in range(0, len(chunk), B):
                rows = chunk[b : b + B]
                chars = np.full((self.max_len, B), -1, np.int32)
                lengths = np.zeros((B,), np.int32)
                for j, idx in enumerate(rows):
                    ids = self.encoded[idx]
                    chars[: len(ids), j] = ids
                    lengths[j] = len(ids)
                yield chars, lengths


def train_language(
    config: Config,
    texts: List[str],
    char_map,
    *,
    max_steps: Optional[int] = None,
    max_epoch: Optional[int] = None,
    learn_rate_override: Optional[float] = None,
    tb_name: Optional[str] = None,
    step_hook: Optional[Callable[[int, Dict], None]] = None,
):
    """Full LM training session. Returns (params, final_step)."""
    lm_params = config.lm_resolved()
    cfg = language.LanguageConfig(
        num_layers=lm_params.num_layers,
        hidden_size=lm_params.hidden_size,
        num_labels=len(char_map),
    )
    B = lm_params.batch_size
    T = min(config.max_target_seq_length, 128)

    params = language.init_params(jax.random.PRNGKey(0), cfg)
    ckpt_dir = config.checkpoint_dir + "/language/"
    restored = ckpt.restore(ckpt_dir, params)
    step0, lr = 0, lm_params.learning_rate
    if restored is not None:
        params, step0, lr = restored
    if learn_rate_override is not None:
        lr = learn_rate_override
    lr = jnp.asarray(lr, jnp.float32)

    train_texts, eval_texts = split_texts(texts)
    train_batches = TextBatcher(train_texts, char_map, T, B, seed=1)
    eval_batches = TextBatcher(eval_texts, char_map, T, B, shuffle=False)
    if not len(train_batches):
        raise ValueError("LM corpus has no usable sentences (>= 2 tokens)")
    logger.info(
        "LM corpus: %d train / %d eval sentences",
        len(train_batches), len(eval_batches),
    )

    opt_state = optim.init_adam(params)

    @jax.jit
    def lm_step(params, opt_state, lr, chars, lengths, rng):
        def loss_fn(p):
            return language.next_char_loss(
                p, cfg, chars, lengths, language.zero_state(cfg, B),
                dropout_rng=rng,
                input_keep_prob=lm_params.dropout_keep_prob,
                output_keep_prob=lm_params.dropout_keep_prob,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads, _ = optim.clip_by_global_norm(grads, lm_params.grad_clip)
        params, opt_state = optim.adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    @jax.jit
    def lm_eval(params, chars, lengths):
        return language.next_char_loss(
            params, cfg, chars, lengths, language.zero_state(cfg, B)
        )

    def eval_perplexity(params) -> Tuple[float, float]:
        """(mean next-char NLL, perplexity) over the held-out sentences.

        Each batch's mean NLL is weighted by its valid-token count so the
        padded final batch (zero-length filler rows) doesn't skew the
        corpus-level mean."""
        total_nll, total_tokens = 0.0, 0.0
        for c, n in eval_batches.epoch():
            tokens = float(np.maximum(n - 1, 0).sum())
            if tokens == 0.0:
                continue
            mean = float(lm_eval(params, jnp.asarray(c), jnp.asarray(n)))
            total_nll += mean * tokens
            total_tokens += tokens
        if total_tokens == 0.0:
            return 0.0, 1.0
        mean = total_nll / total_tokens
        return mean, float(np.exp(mean))

    # Multi-process runs train the LM identically on every host (same
    # corpus, same seeds); only process 0 writes checkpoints/metrics —
    # the same single-writer rule as the acoustic loop.
    is_primary = jax.process_index() == 0
    writer = None
    if config.tensorboard_dir and is_primary:
        writer = metrics_mod.MetricsWriter(
            config.tensorboard_dir, tb_name or "language"
        )
    policy = PlateauPolicy(lm_params.lr_decay_factor)
    rng = jax.random.PRNGKey(0)

    step, epoch = step0, 0
    batch_iter = iter(train_batches.epoch())
    total_steps = 0
    stop = False
    try:
        while not stop:
            window_loss, window_n = 0.0, 0
            for _ in range(config.steps_per_checkpoint):
                try:
                    chars, lengths = next(batch_iter)
                except StopIteration:
                    epoch += 1
                    if max_epoch is not None and epoch > max_epoch:
                        stop = True
                        break
                    batch_iter = iter(train_batches.epoch())
                    chars, lengths = next(batch_iter)
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = lm_step(
                    params, opt_state, lr, jnp.asarray(chars),
                    jnp.asarray(lengths), sub,
                )
                step += 1
                total_steps += 1
                loss_f = float(loss)
                window_loss += loss_f
                window_n += 1
                if step_hook is not None:
                    step_hook(step, {"mean_loss": loss_f})
                if max_steps is not None and total_steps >= max_steps:
                    stop = True
                    break
            if window_n == 0:
                break
            mean_window = window_loss / window_n
            logger.info("LM step %d: window loss %.4f", step, mean_window)
            if is_primary:
                ckpt.save(ckpt_dir, params, step, float(lr))
            if writer:
                writer.add_scalar("lm/learning_rate", float(lr), step)
                writer.add_scalar("lm/train_mean_loss", mean_window, step)

            decay_signal, ran_eval = mean_window, False
            if (
                eval_texts
                and config.steps_per_evaluation
                and step % config.steps_per_evaluation == 0
            ):
                nll, ppl = eval_perplexity(params)
                logger.info(
                    "LM evaluation at step %d : nll %.4f - perplexity %.3f",
                    step, nll, ppl,
                )
                if writer:
                    writer.add_scalar("lm/test_mean_loss", nll, step)
                    writer.add_scalar("lm/test_perplexity", ppl, step)
                decay_signal, ran_eval = nll, True

            # Plateau decay: the acoustic loop mirrors the reference in
            # decaying on the train-window signal, but the LM (no reference
            # protocol to match) decays on held-out NLL whenever evaluation
            # is configured — the right generalization signal.  Without an
            # eval cadence the train-window loss stands in.
            eval_drives = bool(eval_texts and config.steps_per_evaluation)
            if (ran_eval or not eval_drives) and policy.update(decay_signal):
                lr = lr * policy.decay_factor
                logger.info("LM is not improving, decaying the learning rate")
                if float(lr) < MIN_LEARNING_RATE:
                    logger.info("LM learning rate is too low, exiting")
                    break
                if is_primary:
                    ckpt.save(ckpt_dir, params, step, float(lr))
    finally:
        if writer:
            writer.close()
    return params, step
