"""Outer training loop: checkpoint cadence, plateau LR decay, epochs.

Mirrors the reference's training policy (/root/reference/stt.py:171-236):
run ``steps_per_checkpoint`` train steps -> save checkpoint -> every
``steps_per_evaluation`` run an eval pass -> plateau decay (track mean
error rate per checkpoint window; clear the history on a new best; after 7
non-improving windows multiply LR by ``lr_decay_factor``; stop when LR
drops below 1e-7) -> epoch bookkeeping on dataset exhaustion with
reshuffle-or-reuse controlled by ``dataset_size_ordering``
(True / False / First_run_only).

The recurrent-state reset coin (``rnn_state_reset_ratio``,
/root/reference/models/AcousticModel.py:681) is drawn on the host per step
and applied inside the compiled step.
"""

from __future__ import annotations

import logging
import time
from random import randint, shuffle
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnn_speech_tpu.config import Config
from rnn_speech_tpu.train import checkpoint as ckpt
from rnn_speech_tpu.train import metrics as metrics_mod
from rnn_speech_tpu.train import pipeline as pipe_mod
from rnn_speech_tpu.train import step as step_mod

logger = logging.getLogger(__name__)

MIN_LEARNING_RATE = 1e-7
PLATEAU_STRIKES = 7


def _host_local(x) -> np.ndarray:
    """Materialize the locally-addressable rows of a (possibly pod-sharded)
    array — ``np.asarray`` on an array with non-addressable shards raises."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    return np.concatenate(
        [np.asarray(s.data) for s in x.addressable_shards], axis=0
    )


def _gatherable_params(params, mesh):
    """Params safe to hand to ``checkpoint.save`` (which np.asarray's every
    leaf): under multi-process FSDP (mesh_model > 1 on a pod) the gate
    weights are sharded across hosts and must be replicated first."""
    leaves = jax.tree.leaves(params)
    if all(getattr(leaf, "is_fully_addressable", True) for leaf in leaves):
        return params
    from jax.sharding import NamedSharding, PartitionSpec

    replicated = jax.tree.map(
        lambda _: NamedSharding(mesh, PartitionSpec()), params
    )
    return jax.jit(lambda p: p, out_shardings=replicated)(params)


def reset_coin(ratio: float, rng=None) -> bool:
    """randint(1, 1//ratio) == 1 — the reference's exact reset draw.

    Pass a seeded ``random.Random`` to make the sequence deterministic;
    multi-host training requires it so every host applies the same reset
    to its shard of the (data-sharded) recurrent state."""
    upper = max(1, int(1 // ratio)) if ratio > 0 else 1 << 30
    draw = rng.randint if rng is not None else randint
    return draw(1, upper) == 1


class PlateauPolicy:
    """Plateau LR decay with clear-on-improvement, exactly the reference's
    accounting (stt.py:220-223): a new best clears the history and then
    occupies a slot itself, so decay fires after the 6th consecutive
    non-improving window (history length reaches 7 including the best)."""

    def __init__(self, decay_factor: float):
        self.decay_factor = decay_factor
        self.history: List[float] = []

    def update(self, mean_error_rate: float) -> bool:
        """Record a checkpoint-window error rate; True => decay now."""
        if mean_error_rate <= min(self.history, default=float("inf")):
            self.history.clear()
        self.history.append(mean_error_rate)
        if len(self.history) >= PLATEAU_STRIKES:
            self.history.clear()
            return True
        return False


def effective_batch_shape(config: Config) -> Tuple[int, int]:
    """(batch_size, mini_batch_size) after optional microbatch fusion.

    With ``[tpu] fuse_microbatches`` the whole macro batch runs as one
    device batch (mini_batch_size 1): the Adam update is the same summed
    gradient either way, but MXU row utilization improves ~1.7x at the
    reference's 10x3 shape (see TpuConfig.fuse_microbatches)."""
    b, mb = config.batch_size, config.mini_batch_size
    if config.tpu.fuse_microbatches and mb > 1:
        return b * mb, 1
    return b, mb


def train_acoustic(
    config: Config,
    train_set,
    test_set,
    char_map,
    *,
    max_epoch: Optional[int] = None,
    learn_rate_override: Optional[float] = None,
    tb_name: Optional[str] = None,
    timeline: bool = False,
    max_steps: Optional[int] = None,
    mesh=None,
    step_hook: Optional[Callable[[int, Dict], None]] = None,
) -> step_mod.TrainState:
    """Full acoustic training session. Returns the final train state."""
    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    tpu = config.tpu
    compute_dtype = jnp.bfloat16 if tpu.compute_dtype == "bfloat16" else jnp.float32

    batch_size, mini_batch_size = effective_batch_shape(config)
    if batch_size != config.batch_size:
        logger.info(
            "Fusing %d microbatches of %d into one %d-wide device batch",
            config.mini_batch_size, config.batch_size, batch_size,
        )

    # Multi-host pods: batch_size stays the GLOBAL device-batch width; each
    # host's pipeline assembles only its 1/process_count slice of rows
    # (make_sharded_step composes them along the "data" axis).  Bucketed
    # widths are disabled — every process must execute the same compiled
    # program step-for-step for the cross-host collectives to line up, so
    # widths may not vary with each host's local data.
    n_proc = jax.process_count()
    is_primary = jax.process_index() == 0
    host_batch_size = batch_size
    bucket_count = max(tpu.bucket_count, 1)
    if n_proc > 1:
        if batch_size % n_proc:
            raise ValueError(
                f"Global batch {batch_size} not divisible by "
                f"{n_proc} processes"
            )
        host_batch_size = batch_size // n_proc
        if bucket_count > 1:
            logger.info("Multi-host run: disabling width bucketing")
            bucket_count = 1

    pcfg = pipe_mod.PipelineConfig(
        batch_size=host_batch_size,
        mini_batch_size=mini_batch_size,
        max_input_seq_length=config.max_input_seq_length,
        max_target_seq_length=config.max_target_seq_length,
        signal_processing=config.signal_processing,
        num_workers=(
            pipe_mod.default_decode_threads() if tpu.prefetch_depth > 0 else 0
        ),
        prefetch_batches=max(tpu.prefetch_depth, 1),
        bucket_count=bucket_count,
    )
    fe = DeviceFrontend(
        config.signal_processing, sr=pcfg.sample_rate, max_samples=pcfg.max_samples
    )
    model_cfg = acoustic.AcousticConfig(
        num_layers=config.num_layers,
        hidden_size=config.hidden_size,
        input_dim=fe.feature_size,
        num_labels=len(char_map),
        normalization=config.batch_normalization,
        compute_dtype=compute_dtype,
        # The fused recurrence kernel (with its custom-VJP backward) is
        # TPU-only; the scan path is the CPU/debug fallback.
        use_pallas=tpu.use_pallas_lstm and jax.default_backend() != "cpu",
        remat=tpu.remat,
        time_chunk=max(tpu.time_chunk, 0),
        frame_stack=tpu.frame_stack,
        wavefront=tpu.wavefront,
    )
    if tpu.time_chunk == 0:
        # Auto policy: chunked remat engages only when the whole-sequence
        # residual footprint would exceed HBM (large fused batches at long
        # max_input_seq_length); -1 forces whole-sequence, > 0 forces that
        # chunk.  Batch rows shard over data x model, so each device sees
        # batch/(data*model) rows.
        data_shards = (
            mesh.shape.get("data", 1) * mesh.shape.get("model", 1)
            if mesh is not None else 1
        )
        chunk, res_mode = acoustic.training_memory_plan(
            model_cfg, config.max_input_seq_length,
            max(1, batch_size // data_shards),
        )
        if chunk or res_mode != "gates":
            logger.info(
                "Training memory plan at B=%d, T=%d: time_chunk=%d, "
                "residual_mode=%s",
                batch_size // data_shards, config.max_input_seq_length,
                chunk, res_mode,
            )
            import dataclasses

            model_cfg = dataclasses.replace(
                model_cfg, time_chunk=chunk, residual_mode=res_mode
            )
    scfg = step_mod.StepConfig(
        model=model_cfg,
        grad_clip=config.grad_clip,
        input_keep_prob=config.dropout_input_keep_prob,
        output_keep_prob=config.dropout_output_keep_prob,
        frontend=fe,
        use_pallas_ctc=tpu.use_pallas_ctc and jax.default_backend() != "cpu",
        spec_augment=config.spec_augment,
    )
    # Metric-cadence variants ([training] train_metric_every): the greedy
    # decode + edit distance run only on every Nth step; the loss (part of
    # the gradient program anyway) accumulates every step.  Two static
    # configs = two XLA programs, compiled once each; N = 1 (the
    # reference's every-step cadence) never compiles the second.
    metric_every = max(int(getattr(config, "train_metric_every", 1)), 1)
    import dataclasses as _dc

    scfg_nometric = _dc.replace(scfg, train_metric=False)

    state = step_mod.init_train_state(
        jax.random.PRNGKey(0), model_cfg, batch_size, config.learning_rate
    )
    ckpt_dir = config.checkpoint_dir + "/acoustic/"
    restored = ckpt.restore(ckpt_dir, state["params"])
    if restored is not None:
        params, step0, lr = restored
        state["params"] = params
        state["step"] = jnp.asarray(step0, jnp.int32)
        state["lr"] = jnp.asarray(lr, jnp.float32)
    if learn_rate_override is not None:
        state["lr"] = jnp.asarray(learn_rate_override, jnp.float32)

    if mesh is not None:
        from rnn_speech_tpu.parallel import sharding as shard_mod

        state, put_batch, train_fn, eval_fn = shard_mod.make_sharded_step(
            mesh, scfg, state
        )
    else:
        if n_proc > 1:
            raise ValueError(
                "Multi-process training requires a device mesh "
                "(--mesh_data 0 spans the pod)"
            )
        put_batch = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
        train_fn = jax.jit(step_mod.train_step, static_argnums=0,
                           donate_argnums=(1,))
        eval_fn = jax.jit(step_mod.eval_step, static_argnums=0)

    # Checkpoints and metrics are written by process 0 only: every host
    # computes identical replicated params/metrics, so other hosts writing
    # too would be redundant at best and racy on a shared checkpoint_dir.
    writer = None
    if config.tensorboard_dir and is_primary:
        writer = metrics_mod.MetricsWriter(config.tensorboard_dir, tb_name)

    policy = PlateauPolicy(config.lr_decay_factor)
    # rbg keys: dropout masks cost ~2x less to generate on TPU than the
    # default threefry (~27 ms/step at reference shapes); mask quality is
    # irrelevant to dropout statistics.
    rng = jax.random.key(1234, impl="rbg")
    # Seeded host RNG for the state-reset coin: every process draws the
    # same sequence, so the data-sharded recurrent state resets coherently.
    from random import Random

    coin_rng = Random(0xC01)

    epoch = 0
    ordering = config.dataset_size_ordering
    # Multi-host pods: each host feeds only its slice of the corpus.  The
    # eval gate must use the PRE-shard emptiness — identical on every
    # host — because evaluate_dataset runs pod collectives: a host whose
    # shard happened to be empty skipping the call would hang the pod.
    have_test_set = bool(test_set)
    train_set = pipe_mod.shard_for_host(train_set)
    if test_set:
        test_set = pipe_mod.shard_for_host(test_set)

    def make_train_iter():
        # With audio-width bucketing, sort shuffle-windows by duration so
        # each macro batch lands in one bucket (shapes stay homogeneous
        # without losing shuffle-scale randomness).
        data = train_set
        if pcfg.bucket_count > 1:
            window = pcfg.batch_size * pcfg.mini_batch_size * pcfg.bucket_count
            data = pipe_mod.order_by_duration(train_set, window=window)
        return iter(pipe_mod.InputPipeline(data, char_map, pcfg))

    train_iter = make_train_iter()
    total_steps = 0

    def next_batch():
        nonlocal train_iter, epoch
        try:
            return next(train_iter), False
        except StopIteration:
            epoch += 1
            logger.info("End of epoch number : %d", epoch)
            if ordering in ("False", "First_run_only"):
                logger.info("Shuffling the training dataset")
                shuffle(train_set)
            train_iter = make_train_iter()
            try:
                return next(train_iter), True
            except StopIteration:
                # Non-empty file list but every clip was skipped by the
                # pipeline (undecodable audio, decoder errors): surface a
                # diagnosis instead of a bare StopIteration from the loop.
                raise RuntimeError(
                    "Training pipeline produced no batches: every file in "
                    "the dataset was skipped (unreadable or undecodable "
                    "audio). Check the audio format and decoder logs."
                ) from None

    # --timeline: like the reference's per-step chrome traces
    # (stt.py:149-156 + AcousticModel._write_timeline, overwritten each
    # step), capture a bounded window of steps rather than the whole
    # session — traces of early steps include compilation, so the window
    # starts after warmup and spans a handful of steady-state steps.
    TRACE_FIRST, TRACE_LAST = 2, 4
    tracing = False
    if timeline and not config.tensorboard_dir:
        logger.warning("--timeline needs tensorboard_dir; tracing disabled")
        timeline = False

    # Deferred metric fetch: reading a step's metrics blocks the host until
    # the device finishes, so fetching immediately would serialize dispatch
    # and compute.  Holding one step's metrics and draining them AFTER the
    # next step is dispatched keeps the device busy back-to-back (JAX async
    # dispatch); the window/checkpoint logic drains the tail first.
    global_step0 = int(state["step"])
    pending = None    # (session step number, metrics, dispatch_time)

    def drain_pending():
        nonlocal pending, window_err, window_steps, window_ran
        if pending is None:
            return
        step_no, m, t_disp, with_metric = pending
        pending = None
        err = float(m["mean_error_rate"])     # blocks until that step is done
        window_ran += 1
        if with_metric:
            # Only metric-bearing steps enter the window mean the plateau
            # policy decays on (metric-free steps report a structural 0).
            window_err += err
            window_steps += 1
        if step_hook is not None:
            step_hook(step_no, m)
        logger.info(
            "Batch %d : loss %.5f - error_rate %.5f - duration %.2f",
            global_step0 + step_no, float(m["mean_loss"]),
            err if with_metric else float("nan"),
            time.time() - t_disp,
        )

    def global_epoch() -> int:
        """Epoch number all processes agree on (min across hosts — a host
        finishes an epoch only when every host has).  Must be called at the
        same loop point on every process; epochs roll at host-local times,
        so host-local ``epoch`` alone would desynchronize the exit.  Only
        called at checkpoint-window boundaries on pods — a per-step
        cross-host allgather would serialize the pipelined dispatch — so
        multi-host max_epoch exits at window granularity."""
        if n_proc <= 1:
            return epoch
        from jax.experimental import multihost_utils

        return int(multihost_utils.process_allgather(np.asarray(epoch)).min())

    try:
        while True:
            window_err, window_steps, window_ran = 0.0, 0, 0
            for _ in range(config.steps_per_checkpoint):
                batch, rolled = next_batch()
                if max_epoch is not None and n_proc == 1 and \
                        epoch > max_epoch:
                    break
                if timeline and not tracing and total_steps == TRACE_FIRST:
                    jax.profiler.start_trace(config.tensorboard_dir)
                    tracing = True
                rng, sub = jax.random.split(rng)
                t_disp = time.time()
                # StepTraceAnnotation gives the profiler per-step
                # boundaries (XProf's step view), the granularity of the
                # reference's per-step chrome traces
                # (AcousticModel._write_timeline); TraceAnnotation marks
                # the host phases inside each step.
                with_metric = (
                    metric_every <= 1 or total_steps % metric_every == 0
                )
                step_cfg = scfg if with_metric else scfg_nometric
                with jax.profiler.StepTraceAnnotation(
                    "train", step_num=total_steps
                ):
                    with jax.profiler.TraceAnnotation("host/put_batch"):
                        device_batch = put_batch(batch)
                    state, metrics = train_fn(
                        step_cfg, state, device_batch, sub,
                        jnp.asarray(
                            reset_coin(config.rnn_state_reset_ratio, coin_rng)
                        ),
                    )
                total_steps += 1
                with jax.profiler.TraceAnnotation("host/metrics_drain"):
                    drain_pending()   # previous step, while this one runs
                pending = (total_steps, metrics, t_disp, with_metric)
                if tracing and total_steps >= TRACE_LAST:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    tracing = False
                    timeline = False     # one window per session
                if max_steps is not None and total_steps >= max_steps:
                    break
            drain_pending()       # window tail, before the stats are used
            if window_ran == 0:
                # A window that ran no steps (max_epoch/max_steps tripped at
                # the boundary) has no mean to log or decay on — feeding 0.0
                # to the plateau policy would register a spurious "new best"
                # and clear the decay history.
                if max_epoch is not None and global_epoch() > max_epoch:
                    logger.info(
                        "Max number of epochs reached, exiting training session"
                    )
                    break
                if max_steps is not None and total_steps >= max_steps:
                    break
                continue
            # Mean over the metric-bearing steps actually drained: a
            # window truncated by max_steps/max_epoch would otherwise
            # report a mean biased low by steps_run/steps_per_checkpoint —
            # and that biased value feeds both TensorBoard and the plateau
            # policy.  A window whose cadence produced no metric steps
            # (train_metric_every > steps_per_checkpoint) still
            # checkpoints; it just cannot update the plateau policy.
            have_window_err = window_steps > 0
            if have_window_err:
                window_err /= window_steps

            current_step = int(state["step"])
            # The replication gather is a COLLECTIVE: every process must
            # launch it, even though only process 0 writes the file.
            params_for_save = _gatherable_params(state["params"], mesh)
            if is_primary:
                ckpt.save(ckpt_dir, params_for_save, current_step,
                          float(state["lr"]))
            if writer:
                writer.add_scalar("learning_rate", float(state["lr"]), current_step)
                if have_window_err:
                    writer.add_scalar("train/mean_error_rate", window_err,
                                      current_step)
                for li, (c, h) in enumerate(state["states"]):
                    # Data-sharded states: on pods only this host's rows
                    # are addressable; histogram those (representative —
                    # rows are i.i.d. utterance streams).
                    writer.add_histogram(f"rnn/layer{li}_cell",
                                         _host_local(c), current_step)
                    writer.add_histogram(f"rnn/layer{li}_hidden",
                                         _host_local(h), current_step)

            if (
                have_test_set
                and config.steps_per_evaluation
                and current_step % config.steps_per_evaluation == 0
            ):
                eval_metrics = evaluate_dataset(
                    eval_fn, scfg, state, test_set, char_map, pcfg, put_batch
                )
                logger.info(
                    "Evaluation at step %d : loss %.5f - error_rate %.5f",
                    current_step, eval_metrics["mean_loss"],
                    eval_metrics["mean_error_rate"],
                )
                if writer:
                    writer.add_scalar("test/mean_loss",
                                      eval_metrics["mean_loss"], current_step)
                    writer.add_scalar("test/mean_error_rate",
                                      eval_metrics["mean_error_rate"], current_step)

            if have_window_err and policy.update(window_err):
                state["lr"] = state["lr"] * policy.decay_factor
                logger.info("Model is not improving, decaying the learning rate")
                if float(state["lr"]) < MIN_LEARNING_RATE:
                    logger.info("Learning rate is too low, exiting")
                    break
                params_for_save = _gatherable_params(state["params"], mesh)
                if is_primary:
                    ckpt.save(ckpt_dir, params_for_save, current_step,
                              float(state["lr"]))

            if max_epoch is not None and global_epoch() > max_epoch:
                logger.info("Max number of epochs reached, exiting training session")
                break
            if max_steps is not None and total_steps >= max_steps:
                break
    finally:
        if tracing:
            jax.profiler.stop_trace()
        if writer:
            writer.close()
    return state


def evaluate_dataset(
    eval_fn, scfg, state, test_set, char_map, pcfg, put_batch
) -> Dict[str, float]:
    """Mean loss/error over one pass of the test pipeline.

    Metric fetches trail dispatch by a bounded window, so the device runs
    batches back-to-back without per-batch syncs while in-flight memory
    stays O(window), not O(test set).

    Multi-process pods: the eval step psums across the pod, so dispatch
    follows the lockstep contract of parallel/lockstep.py — step count
    agreed by ONE upfront bound-allgather, exhausted hosts feeding
    all-padding batches (which the psummed metrics ignore).  A single
    closing allgather of the real counts then drops the trailer steps
    that were padding on EVERY host, so they don't bias the mean low."""
    import jax as _jax
    from collections import deque

    WINDOW = 4
    in_flight = deque()
    drained: List[Tuple[float, float]] = []

    def drain_one():
        m = in_flight.popleft()
        drained.append(
            (float(m["mean_loss"]), float(m["mean_error_rate"]))
        )

    batches = iter(pipe_mod.InputPipeline(test_set, char_map, pcfg))
    real_steps = None
    if _jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from rnn_speech_tpu.parallel import lockstep

        macro = pcfg.batch_size * pcfg.mini_batch_size
        total = lockstep.pod_dispatch_bound(-(-len(test_set) // macro))
        empty = None
        local_real = 0
        for _ in range(total):
            batch = next(batches, None)
            if batch is None:
                if empty is None:
                    empty = pipe_mod.InputPipeline(
                        [], char_map, pcfg
                    ).empty_batch()
                batch = empty
            else:
                local_real += 1
            in_flight.append(eval_fn(scfg, state, put_batch(batch)))
            if len(in_flight) > WINDOW:
                drain_one()
        # Hosts feed their real batches first, so step i carried real data
        # somewhere on the pod iff i < max(local_real); later steps were
        # all-padding pod-wide and their (guarded) zero metrics would bias
        # the mean low.
        real_steps = int(
            multihost_utils.process_allgather(np.asarray(local_real)).max()
        )
    else:
        for batch in batches:
            in_flight.append(eval_fn(scfg, state, put_batch(batch)))
            if len(in_flight) > WINDOW:
                drain_one()
    while in_flight:
        drain_one()
    kept = drained if real_steps is None else drained[:real_steps]
    if not kept:
        return {"mean_loss": 0.0, "mean_error_rate": 0.0}
    return {
        "mean_loss": sum(m[0] for m in kept) / len(kept),
        "mean_error_rate": sum(m[1] for m in kept) / len(kept),
    }
