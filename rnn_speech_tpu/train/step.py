"""The jit-compiled train/eval steps with microbatch gradient accumulation.

Reimplements the reference's three-phase batch protocol —
``start_batch`` / N x ``run_step`` / ``end_batch``
(/root/reference/models/AcousticModel.py:634-703, 887-939) — as ONE compiled
program per step: a ``lax.scan`` over microbatches accumulates summed CTC
gradients, loss and error-rate metrics while threading the recurrent state,
then the summed gradients are global-norm clipped and applied with Adam.
What took the reference 2 + N session round-trips per step is a single
device dispatch here.

The optional on-device frontend means a batch can arrive as raw padded
audio; featurization then happens inside the same compiled step (the
reference burned host CPU in tf.py_func workers for this).

Deviation (documented): the train-time error-rate metric decodes greedily
instead of running a beam search every microbatch — the reference's
in-graph beam decode per mini-batch was a known training-throughput sink
and affects only the metric, not the gradient.  Eval/WER paths use the full
beam decoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rnn_speech_tpu.models import acoustic
from rnn_speech_tpu.ops import ctc, decode, editdistance
from rnn_speech_tpu.train import optim

TrainState = Dict[str, Any]   # params / opt / states / step / lr


def _vary(x, axis_name):
    """Mark x as device-varying over shard_map axis/axes (scan carries
    inside shard_map must be vma-typed to match their varying outputs).
    Axes the value already varies over are skipped — e.g. a gradient
    buffer zeros_like'd from model-axis-gathered weights is already
    varying over "model"."""
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    try:
        current = jax.typeof(x).vma
    except Exception:  # outside shard_map tracing / old jax
        current = frozenset()
    axes = tuple(a for a in axes if a not in current)
    if not axes:
        return x
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axes, to="varying")
    return jax.lax.pvary(x, axes)  # pre-pcast spelling


@dataclass(frozen=True)
class StepConfig:
    model: acoustic.AcousticConfig
    grad_clip: float = 1.0
    input_keep_prob: float = 0.8
    output_keep_prob: float = 0.5
    frontend: Optional[Any] = None        # DeviceFrontend for raw-audio batches
    greedy_metric_max_out: int = 0        # cap decode width for the metric
    use_pallas_ctc: bool = False          # fused CTC kernels (TPU only)
    spec_augment: bool = False            # on-device time/freq masking (train)
    # Compute the greedy-decode + edit-distance train metric in this step.
    # The reference ran its beam decoder every mini-batch only because its
    # graph tied ``prediction`` to the error accumulator
    # (/root/reference/models/AcousticModel.py:363-383); the metric is
    # observability, not gradient, so the train loop can run it on a
    # configurable cadence ([training] train_metric_every) by alternating
    # two step variants.  False skips the decode entirely (the loss still
    # accumulates every step) and reports error-rate 0 with count 0.
    train_metric: bool = True


def _ctc_loss_fn(cfg: "StepConfig"):
    if cfg.use_pallas_ctc:
        import os

        from rnn_speech_tpu.ops import ctc_pallas

        # bf16-computing models take the backward's (T, B, S) posterior
        # stream in bf16 too (exp-space, bounded [0, 1] — ~0.2 % relative
        # rounding on the gradient's label term, consistent with the bf16
        # dgates/residual streams everywhere else).  Halves the largest
        # CTC backward temp; RST_CTC_POST_F32=1 restores the f32 stream
        # for A/B triage.
        if (jnp.dtype(cfg.model.compute_dtype) == jnp.bfloat16
                and os.environ.get("RST_CTC_POST_F32", "0") != "1"):
            def loss_fn(logits, logit_lengths, labels, label_lengths):
                return ctc_pallas.ctc_loss(
                    logits, logit_lengths, labels, label_lengths,
                    -1, jnp.bfloat16,
                )
            return loss_fn
        return ctc_pallas.ctc_loss
    return ctc.ctc_loss


def init_train_state(
    key: jax.Array,
    cfg: acoustic.AcousticConfig,
    batch_size: int,
    learning_rate: float,
) -> TrainState:
    params = acoustic.init_params(key, cfg)
    return {
        "params": params,
        "opt": optim.init_adam(params),
        "states": acoustic.zero_state(cfg, batch_size),
        "step": jnp.zeros((), jnp.int32),
        "lr": jnp.asarray(learning_rate, jnp.float32),
    }


def _featurize_micro(cfg: StepConfig, micro: Dict[str, jnp.ndarray]):
    """Returns (features (T, B, D), frame_lengths (B,)) for one microbatch."""
    if "features" in micro:
        # (B, T, D) batch-major from the pipeline -> time-major.
        feats = jnp.transpose(micro["features"], (1, 0, 2))
        return feats, micro["frame_lengths"]
    fe = cfg.frontend
    feats, nf = fe(micro["audio"], micro["audio_lengths"])   # (B, T, D)
    return jnp.transpose(feats, (1, 0, 2)), nf


def _micro_loss(params, cfg: StepConfig, states, feats, frame_lengths,
                labels, label_lengths, rng):
    logits, new_states = acoustic.forward(
        params, cfg.model, feats, frame_lengths, states,
        dropout_rng=rng,
        input_keep_prob=cfg.input_keep_prob,
        output_keep_prob=cfg.output_keep_prob,
    )
    out_lengths = acoustic.output_lengths(cfg.model, frame_lengths)
    per_example = _ctc_loss_fn(cfg)(logits, out_lengths, labels, label_lengths)
    total = jnp.sum(per_example)          # grads of the SUM, like TF's Adam
    # Per-LOGIT-frame normalization (== per input frame without stacking):
    # keeps reported loss comparable across frame_stack settings.
    denom = jnp.maximum(out_lengths.astype(jnp.float32), 1.0)
    # Short final batches are padded with empty rows (frame_lengths == 0);
    # average only over real examples so the metric isn't diluted.
    real = (frame_lengths > 0).astype(jnp.float32)
    mean_loss = jnp.sum(per_example / denom * real) / jnp.maximum(
        jnp.sum(real), 1.0
    )
    return total, (mean_loss, logits, new_states)


def accumulate_grads(
    cfg: StepConfig,
    params,
    states,
    batch: Dict[str, jnp.ndarray],   # (MB, B, ...) microbatches
    rng: jax.Array,
    axis_name: Optional[str] = None,
):
    """Scan the microbatches: summed grads + metric SUMS + threaded state.

    Returns (states, grad_sum, loss_sum, err_sum, real_micro_count): the
    metric sums are left undivided so that under ``shard_map`` the caller
    can psum both sums and counts before dividing — exact even when batch
    padding is unevenly sharded across devices (pass ``axis_name`` so the
    scan carries are typed as device-varying)."""
    grad_zero = jax.tree.map(jnp.zeros_like, params)
    zero = jnp.zeros((), jnp.float32)
    if axis_name is not None:
        grad_zero = jax.tree.map(lambda g: _vary(g, axis_name), grad_zero)
        zero = _vary(zero, axis_name)

    def micro_body(carry, micro):
        states, grad_acc, loss_acc, err_acc, cnt_acc, mrng = carry
        mrng, drop_rng = jax.random.split(mrng)
        feats, frame_lengths = _featurize_micro(cfg, micro)
        if cfg.spec_augment:
            from rnn_speech_tpu.ops import augment

            mrng, aug_rng = jax.random.split(mrng)
            feats = augment.spec_augment(
                feats, frame_lengths, aug_rng,
                groups=augment.groups_for_feature_dim(feats.shape[-1]),
            )
        labels = micro["labels"]
        label_lengths = micro["label_lengths"]

        (_, (mean_loss, logits, new_states)), grads = jax.value_and_grad(
            _micro_loss, has_aux=True
        )(params, cfg, states, feats, frame_lengths, labels, label_lengths,
          drop_rng)

        # Error-rate metric: greedy decode vs truth, no gradient.  Gated
        # by cfg.train_metric (static) so metric-free steps never trace
        # the decode/DP at all.
        if cfg.train_metric:
            pred, pred_len = decode.greedy_decode(
                jax.lax.stop_gradient(logits),
                acoustic.output_lengths(cfg.model, frame_lengths),
                max_output=cfg.greedy_metric_max_out or labels.shape[1],
            )
            err = editdistance.error_rate(pred, pred_len, labels,
                                          label_lengths)
        else:
            err = jnp.zeros((), jnp.float32)

        grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
        # All-padding microbatches (short final macro batch) contribute 0
        # to both accumulators; count only real ones so they don't dilute
        # the means either.
        real = (jnp.sum(frame_lengths > 0) > 0).astype(jnp.float32)
        return (new_states, grad_acc, loss_acc + mean_loss, err_acc + err,
                cnt_acc + real, mrng), None

    (states, grad_sum, loss_sum, err_sum, cnt, _), _ = jax.lax.scan(
        micro_body, (states, grad_zero, zero, zero, zero, rng), batch
    )
    return states, grad_sum, loss_sum, err_sum, cnt


def apply_grads(
    cfg: StepConfig,
    state: TrainState,
    states,                          # recurrent states after the batch
    grad_sum,
    mean_loss: jnp.ndarray,
    mean_err: jnp.ndarray,
    reset_state: jnp.ndarray,
    grad_norm: Optional[jnp.ndarray] = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Clip + Adam + state-reset half of a train step (replicated under DP).

    ``grad_norm`` overrides the locally-computed global norm — required
    when the gradient tree is model-axis sharded (the true norm folds in
    the other shards' squared sums)."""
    params = state["params"]
    if grad_norm is None:
        clipped, grad_norm = optim.clip_by_global_norm(grad_sum, cfg.grad_clip)
    else:
        clipped, grad_norm = optim.clip_with_norm(
            grad_sum, cfg.grad_clip, grad_norm
        )
    new_params, new_opt = optim.adam_update(
        params, clipped, state["opt"], state["lr"]
    )

    # Stochastic recurrent-state reset (the rnn_state_reset_ratio policy):
    # the host draws the coin, the device applies it.
    states = jax.tree.map(
        lambda s: jnp.where(reset_state, jnp.zeros_like(s), s), states
    )

    new_state = {
        "params": new_params,
        "opt": new_opt,
        "states": states,
        "step": state["step"] + 1,
        "lr": state["lr"],
    }
    metrics = {
        "mean_loss": mean_loss,
        "mean_error_rate": mean_err,
        "grad_norm": grad_norm,
    }
    return new_state, metrics


def train_step(
    cfg: StepConfig,
    state: TrainState,
    batch: Dict[str, jnp.ndarray],   # leading axis = microbatches (MB, B, ...)
    rng: jax.Array,
    reset_state: jnp.ndarray,        # bool scalar: zero recurrent state after
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    states, grad_sum, loss_sum, err_sum, cnt = accumulate_grads(
        cfg, state["params"], state["states"], batch, rng
    )
    denom = jnp.maximum(cnt, 1.0)
    return apply_grads(
        cfg, state, states, grad_sum, loss_sum / denom, err_sum / denom,
        reset_state,
    )


def eval_step(
    cfg: StepConfig,
    state: TrainState,
    batch: Dict[str, jnp.ndarray],   # (MB, B, ...) like train batches
    axis_name: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Loss + greedy error rate over a batch, no dropout, fresh zero state
    per batch (the reference always reset state in evaluation mode)."""
    params = state["params"]
    B = jax.tree.leaves(batch)[0].shape[1]
    zero_states = acoustic.zero_state(cfg.model, B)
    zero = jnp.zeros((), jnp.float32)
    if axis_name is not None:
        zero_states = jax.tree.map(lambda s: _vary(s, axis_name), zero_states)
        zero = _vary(zero, axis_name)

    def micro_body(carry, micro):
        loss_acc, err_acc, cnt_acc = carry
        feats, frame_lengths = _featurize_micro(cfg, micro)
        logits, _ = acoustic.forward(
            params, cfg.model, feats, frame_lengths, zero_states
        )
        out_lengths = acoustic.output_lengths(cfg.model, frame_lengths)
        per = _ctc_loss_fn(cfg)(logits, out_lengths, micro["labels"],
                                micro["label_lengths"])
        denom = jnp.maximum(out_lengths.astype(jnp.float32), 1.0)
        real = (frame_lengths > 0).astype(jnp.float32)
        mean_loss = jnp.sum(per / denom * real) / jnp.maximum(jnp.sum(real), 1.0)
        pred, pred_len = decode.greedy_decode(
            logits, out_lengths, max_output=micro["labels"].shape[1]
        )
        err = editdistance.error_rate(
            pred, pred_len, micro["labels"], micro["label_lengths"]
        )
        # Don't let all-padding microbatches (small test sets) dilute the
        # means the PlateauPolicy decays on.
        any_real = (jnp.sum(real) > 0).astype(jnp.float32)
        return (loss_acc + mean_loss, err_acc + err, cnt_acc + any_real), None

    (loss_sum, err_sum, cnt), _ = jax.lax.scan(
        micro_body, (zero, zero, zero), batch
    )
    if axis_name is not None:
        # Sum sums and counts across shards before dividing: exact even
        # when padding is unevenly sharded.
        loss_sum = jax.lax.psum(loss_sum, axis_name)
        err_sum = jax.lax.psum(err_sum, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    denom = jnp.maximum(cnt, 1.0)
    return {
        "mean_loss": loss_sum / denom,
        "mean_error_rate": err_sum / denom,
    }


def forward_step(
    cfg: StepConfig,
    params,
    states,
    feats_tm: jnp.ndarray,        # (T, B, D) time-major features
    frame_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, Any]:
    """Inference forward: logits + updated streaming state (no dropout)."""
    return acoustic.forward(params, cfg.model, feats_tm, frame_lengths, states)
