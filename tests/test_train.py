"""Model + train-step tests: convergence, state carry, checkpoint, pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_speech_tpu.charmap import CharMap
from rnn_speech_tpu.models import acoustic, language
from rnn_speech_tpu.train import checkpoint, optim, pipeline, step as step_mod


def make_cfg(**kw):
    defaults = dict(num_layers=2, hidden_size=16, input_dim=8, num_labels=6)
    defaults.update(kw)
    return acoustic.AcousticConfig(**defaults)


@pytest.fixture(scope="module")
def toy_batch():
    """Synthetic separable task: feature channel c active => label c."""
    rng = np.random.default_rng(0)
    MB, B, T, D, L = 2, 3, 20, 8, 5
    feats = rng.normal(0, 0.1, (MB, B, T, D)).astype(np.float32)
    labels = np.full((MB, B, L), -1, np.int32)
    label_lengths = np.zeros((MB, B), np.int32)
    frame_lengths = np.full((MB, B), T, np.int32)
    for m in range(MB):
        for b in range(B):
            seq = rng.integers(0, 4, 3)
            labels[m, b, :3] = seq
            label_lengths[m, b] = 3
            for i, c in enumerate(seq):
                feats[m, b, i * 6 : i * 6 + 4, c] += 2.0
    return {
        "features": feats,
        "frame_lengths": frame_lengths,
        "labels": labels,
        "label_lengths": label_lengths,
    }


def test_spec_augment_masks_and_bounds():
    from rnn_speech_tpu.ops import augment

    T, B, D = 50, 4, 120
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(1.0, 0.1, (T, B, D)).astype(np.float32))
    lengths = jnp.asarray([50, 30, 50, 10], np.int32)
    out = augment.spec_augment(
        feats, lengths, jax.random.PRNGKey(3), groups=3,
        n_freq_masks=2, freq_mask_width=8, n_time_masks=2,
        time_mask_ratio=0.1,
    )
    out = np.asarray(out)
    src = np.asarray(feats)
    # Something masked, everything else untouched, zeros where masked.
    changed = out != src
    assert changed.any()
    assert np.all(out[changed] == 0.0)
    for b in range(B):
        # Frequency masks replicate across the 3 feature groups: the set of
        # fully-masked (all-time) channels is identical per group.
        full_t = np.asarray(lengths)[b]
        col_masked = (out[:full_t, b, :] == 0.0).all(axis=0)   # (120,)
        g = col_masked.reshape(3, 40)
        assert (g[0] == g[1]).all() and (g[1] == g[2]).all()
        # At most n*max_width channels per group.
        assert g[0].sum() <= 2 * 8
        # Time masks: rows fully zero; bounded count within the length.
        row_masked = (out[:full_t, b, :] == 0.0).all(axis=1)
        assert row_masked.sum() <= max(2 * int(0.1 * full_t), 2)


def test_train_step_spec_augment_runs(toy_batch):
    cfg = step_mod.StepConfig(
        model=make_cfg(), grad_clip=5.0, input_keep_prob=1.0,
        output_keep_prob=1.0, spec_augment=True,
    )
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.01)
    batch = {k: jnp.asarray(v) for k, v in toy_batch.items()}
    train = jax.jit(step_mod.train_step, static_argnums=0)
    for i in range(3):
        state, metrics = train(
            cfg, state, batch, jax.random.PRNGKey(i), jnp.asarray(False)
        )
    assert np.isfinite(float(metrics["mean_loss"]))


def test_batch_norm_batch1_is_not_erased():
    """With normalization on and batch size 1, the forward must still depend
    on the input (the reference's batch-axis moments degenerate to all-zero
    activations at B=1, making --file/--record audio-independent)."""
    cfg = make_cfg(normalization=True)
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    states = acoustic.zero_state(cfg, 1)
    lengths = jnp.asarray([10], jnp.int32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(0, 1, (10, 1, 8)), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, (10, 1, 8)), jnp.float32)
    l1, _ = acoustic.forward(params, cfg, x1, lengths, states)
    l2, _ = acoustic.forward(params, cfg, x2, lengths, states)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_train_step_decreases_loss(toy_batch):
    cfg = step_mod.StepConfig(
        model=make_cfg(), grad_clip=5.0, input_keep_prob=1.0, output_keep_prob=1.0
    )
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.01)
    batch = {k: jnp.asarray(v) for k, v in toy_batch.items()}
    train = jax.jit(step_mod.train_step, static_argnums=0)
    losses = []
    for i in range(60):
        state, metrics = train(
            cfg, state, batch, jax.random.PRNGKey(i), jnp.asarray(True)
        )
        losses.append(float(metrics["mean_loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert int(state["step"]) == 60
    assert float(metrics["mean_error_rate"]) < 1.0


def test_stack_frames_values_and_lengths():
    T, B, D, N = 7, 2, 3, 2
    x = np.arange(T * B * D, dtype=np.float32).reshape(T, B, D)
    lengths = np.asarray([7, 4], np.int32)
    y, out_len = acoustic.stack_frames(
        jnp.asarray(x), jnp.asarray(lengths), N
    )
    assert y.shape == (4, B, N * D)
    np.testing.assert_array_equal(np.asarray(out_len), [4, 2])
    # Stacked frame t = concat(x[2t], x[2t+1]); the T=7 tail pads zeros.
    np.testing.assert_array_equal(
        np.asarray(y)[0, 0], np.concatenate([x[0, 0], x[1, 0]])
    )
    np.testing.assert_array_equal(
        np.asarray(y)[3, 1], np.concatenate([x[6, 1], np.zeros(D)])
    )


def test_train_step_frame_stack_decreases_loss(toy_batch):
    """The frame-stacked model (T/2 logits) must still learn the toy task
    and keep logit/length pairing consistent through loss and metric."""
    cfg = step_mod.StepConfig(
        model=make_cfg(frame_stack=2), grad_clip=5.0,
        input_keep_prob=1.0, output_keep_prob=1.0,
    )
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.01)
    assert state["params"]["input"]["w"].shape[0] == 16   # 2 * input_dim
    batch = {k: jnp.asarray(v) for k, v in toy_batch.items()}
    train = jax.jit(step_mod.train_step, static_argnums=0)
    losses = []
    for i in range(60):
        state, metrics = train(
            cfg, state, batch, jax.random.PRNGKey(i), jnp.asarray(True)
        )
        losses.append(float(metrics["mean_loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_eval_step_runs(toy_batch):
    cfg = step_mod.StepConfig(model=make_cfg())
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.01)
    batch = {k: jnp.asarray(v) for k, v in toy_batch.items()}
    metrics = jax.jit(step_mod.eval_step, static_argnums=0)(cfg, state, batch)
    assert np.isfinite(float(metrics["mean_loss"]))
    assert np.isfinite(float(metrics["mean_error_rate"]))


def test_state_reset_flag(toy_batch):
    cfg = step_mod.StepConfig(model=make_cfg())
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.01)
    batch = {k: jnp.asarray(v) for k, v in toy_batch.items()}
    s1, _ = step_mod.train_step(cfg, state, batch, jax.random.PRNGKey(0),
                                jnp.asarray(False))
    assert float(jnp.abs(s1["states"][0][0]).max()) > 0.0
    s2, _ = step_mod.train_step(cfg, state, batch, jax.random.PRNGKey(0),
                                jnp.asarray(True))
    for c, h in s2["states"]:
        assert float(jnp.abs(c).max()) == 0.0
        assert float(jnp.abs(h).max()) == 0.0


def test_grad_clip_bounds_update():
    g = {"a": jnp.full((4,), 100.0), "b": jnp.full((2, 2), -50.0)}
    clipped, norm = optim.clip_by_global_norm(g, 1.0)
    assert float(optim.global_norm(clipped)) == pytest.approx(1.0, rel=1e-5)
    assert float(norm) > 100.0
    # Under the threshold: unchanged.
    g2 = {"a": jnp.asarray([0.1, 0.2])}
    clipped2, _ = optim.clip_by_global_norm(g2, 1.0)
    np.testing.assert_allclose(clipped2["a"], g2["a"], rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = make_cfg()
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    path = checkpoint.save(str(tmp_path), params, step=42, learning_rate=3e-4)
    assert os.path.exists(path)
    out = checkpoint.restore(str(tmp_path), params)
    assert out is not None
    restored, step, lr = out
    assert step == 42 and lr == pytest.approx(3e-4)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_latest_and_missing(tmp_path):
    cfg = make_cfg()
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    assert checkpoint.restore(str(tmp_path), params) is None
    checkpoint.save(str(tmp_path), params, 1, 0.1)
    checkpoint.save(str(tmp_path), params, 7, 0.2)
    _, step, lr = checkpoint.restore(str(tmp_path), params)
    assert step == 7 and lr == pytest.approx(0.2)


def test_checkpoint_retention(tmp_path):
    """save() keeps only the `keep` highest-step bundles (Saver's
    max_to_keep=5 semantics); keep<=0 disables pruning."""
    cfg = make_cfg()
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    for s in range(1, 8):
        checkpoint.save(str(tmp_path), params, s, 0.1, keep=3)
    names = sorted(
        n for n in os.listdir(str(tmp_path)) if n.endswith(".npz")
    )
    assert names == [f"acousticmodel-{s}.npz" for s in (5, 6, 7)]
    _, step, _ = checkpoint.restore(str(tmp_path), params)
    assert step == 7
    checkpoint.save(str(tmp_path), params, 8, 0.1, keep=0)
    assert len([n for n in os.listdir(str(tmp_path)) if n.endswith(".npz")]) == 4


def test_checkpoint_corrupt_pointer_recovers(tmp_path):
    """A truncated/garbage pointer file (crash mid-write) must fall back to
    scanning the atomically-written bundles, not break restore forever."""
    cfg = make_cfg()
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    checkpoint.save(str(tmp_path), params, 5, 0.1)
    for garbage in ("", "{not json", '{"other": 1}'):
        with open(os.path.join(str(tmp_path), checkpoint.POINTER_FILE), "w") as fh:
            fh.write(garbage)
        out = checkpoint.restore(str(tmp_path), params)
        assert out is not None and out[1] == 5


def test_checkpoint_shape_mismatch(tmp_path):
    params = acoustic.init_params(jax.random.PRNGKey(0), make_cfg())
    checkpoint.save(str(tmp_path), params, 1, 0.1)
    bigger = acoustic.init_params(jax.random.PRNGKey(0), make_cfg(hidden_size=32))
    with pytest.raises(ValueError):
        checkpoint.restore(str(tmp_path), bigger)


# ---------------------------------------------------------------- pipeline

@pytest.fixture(scope="module")
def wav_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    from rnn_speech_tpu import audio_io

    rng = np.random.default_rng(1)
    dataset = []
    for i, text in enumerate(["hello there", "nice day", "the cat sat",
                              "on the mat", "very good"]):
        dur = 0.5 + 0.2 * i
        n = int(22050 * dur)
        sig = (0.3 * np.sin(2 * np.pi * (300 + 100 * i) * np.arange(n) / 22050)
               + 0.01 * rng.normal(size=n)).astype(np.float32)
        path = str(root / f"clip{i}.wav")
        audio_io.write_wav(path, sig, 22050)
        dataset.append([path, text, dur])
    return dataset


def test_pipeline_device_mode(wav_dataset):
    cm = CharMap()
    cfg = pipeline.PipelineConfig(
        batch_size=2, mini_batch_size=2, max_input_seq_length=120,
        max_target_seq_length=30,
    )
    batches = list(pipeline.InputPipeline(wav_dataset, cm, cfg))
    assert len(batches) == 2        # 5 items -> 4 + 1(padded)
    b0 = batches[0]
    assert b0["audio"].shape == (2, 2, cfg.max_samples)
    assert b0["audio_lengths"].shape == (2, 2)
    assert b0["labels"].shape == (2, 2, 30)
    # Final batch padded with empty items.
    b1 = batches[1]
    assert int(b1["audio_lengths"][0, 1]) == 0 or int(b1["label_lengths"][0, 1]) == 0


def test_pipeline_host_mode(wav_dataset):
    cm = CharMap()
    cfg = pipeline.PipelineConfig(
        batch_size=2, mini_batch_size=1, max_input_seq_length=120,
        max_target_seq_length=30, on_device_frontend=False,
    )
    batches = list(pipeline.InputPipeline(wav_dataset, cm, cfg))
    b0 = batches[0]
    assert b0["features"].shape == (1, 2, 120, 120)
    assert (b0["frame_lengths"] <= 120).all()
    assert b0["label_lengths"].max() > 0


def test_pipeline_parallel_matches_sync(wav_dataset):
    cm = CharMap()
    kw = dict(batch_size=2, mini_batch_size=1, max_input_seq_length=120,
              max_target_seq_length=30)
    sync = list(pipeline.InputPipeline(
        wav_dataset, cm, pipeline.PipelineConfig(**kw)))
    par = list(pipeline.InputPipeline(
        wav_dataset, cm, pipeline.PipelineConfig(num_workers=2, **kw)))
    assert len(sync) == len(par)
    for s, p in zip(sync, par):
        np.testing.assert_array_equal(s["audio_lengths"], p["audio_lengths"])
        np.testing.assert_allclose(s["audio"], p["audio"], atol=1e-7)
        np.testing.assert_array_equal(s["labels"], p["labels"])


def test_train_step_on_device_frontend(wav_dataset):
    """End-to-end: raw audio batch -> on-device featurize -> CTC step."""
    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    cm = CharMap()
    pcfg = pipeline.PipelineConfig(
        batch_size=2, mini_batch_size=2, max_input_seq_length=120,
        max_target_seq_length=30,
    )
    batch = next(iter(pipeline.InputPipeline(wav_dataset, cm, pcfg)))
    fe = DeviceFrontend("fbank", sr=22050, max_samples=pcfg.max_samples)
    cfg = step_mod.StepConfig(
        model=make_cfg(input_dim=120, num_labels=len(cm)),
        frontend=fe, input_keep_prob=1.0, output_keep_prob=1.0,
    )
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 2, 1e-3)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step_mod.train_step(
        cfg, state, jbatch, jax.random.PRNGKey(0), jnp.asarray(True)
    )
    assert np.isfinite(float(metrics["mean_loss"]))
    assert float(metrics["mean_loss"]) > 0


def test_language_model_loss_and_generate():
    cm = CharMap()
    cfg = language.LanguageConfig(num_layers=1, hidden_size=16, num_labels=len(cm))
    params = language.init_params(jax.random.PRNGKey(0), cfg)
    ids = cm.encode("hello world hello world", add_eos=False)
    T = len(ids)
    chars = jnp.asarray(np.asarray(ids)[:, None], jnp.int32)
    loss = language.next_char_loss(
        params, cfg, chars, jnp.asarray([T]), language.zero_state(cfg, 1)
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    out = language.generate(params, cfg, cm.encode("O", add_eos=False), 5)
    assert len(out) == 5
    assert all(0 <= c < len(cm) for c in out)


def test_pipeline_bucketed_widths(tmp_path):
    """bucket_count > 1 pads each macro batch to the smallest covering
    bucket width instead of max_samples."""
    import numpy as np

    from rnn_speech_tpu import audio_io
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer
    from rnn_speech_tpu.train import pipeline as pipe_mod

    d = str(tmp_path)
    rng = np.random.default_rng(0)
    dataset = []
    for i, seconds in enumerate((0.3, 0.35, 2.2, 2.4)):
        n = int(22050 * seconds)
        path = os.path.join(d, f"{i}.wav")
        audio_io.write_wav(path, rng.normal(0, 0.2, n).astype(np.float32), 22050)
        dataset.append([path, "test words", seconds])

    cm = SpeechRecognizer("english").get_char_map()
    cfg = pipe_mod.PipelineConfig(
        batch_size=2, mini_batch_size=1, max_input_seq_length=300,
        max_target_seq_length=20, bucket_count=4,
    )
    batches = list(pipe_mod.InputPipeline(dataset, cm, cfg))
    assert len(batches) == 2
    widths = sorted(b["audio"].shape[-1] for b in batches)
    unit = -(-cfg.max_samples // 4)
    assert widths[0] == unit                 # short clips -> 1 bucket unit
    assert widths[1] in (3 * unit, cfg.max_samples)  # long clips -> bigger
    assert widths[1] > widths[0]
    # Lengths never exceed the bucket width.
    for b in batches:
        assert int(b["audio_lengths"].max()) <= b["audio"].shape[-1]


def test_shard_for_host():
    from rnn_speech_tpu.train import pipeline as pipe_mod

    data = [[f"f{i}", "t", float(i)] for i in range(10)]
    # Single process: unchanged.
    assert pipe_mod.shard_for_host(data, 0, 1) == data
    # Two hosts: strided, disjoint, exhaustive.
    a = pipe_mod.shard_for_host(data, 0, 2)
    b = pipe_mod.shard_for_host(data, 1, 2)
    assert len(a) == len(b) == 5
    assert sorted(map(tuple, a + b)) == sorted(map(tuple, data))
    assert a[0][0] == "f0" and b[0][0] == "f1"
    # Defaults resolve from the live (single-process) JAX topology.
    assert pipe_mod.shard_for_host(data) == data


def test_auto_time_chunk_policy():
    """Chunked remat engages only past the HBM budget, at reference-model
    shapes: B=30 whole-sequence (round-1 behavior preserved), B=64 the
    first fitting ladder rung, tiny shapes never chunk."""
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic

    cfg = acoustic.AcousticConfig(
        num_layers=3, hidden_size=1024, input_dim=120, num_labels=80,
        compute_dtype=jnp.bfloat16, use_pallas=True,
    )
    assert acoustic.auto_time_chunk(cfg, 3510, 30) == 0
    # B=64 whole-sequence is measured to fit and run fastest (202 utt/s).
    assert acoustic.auto_time_chunk(cfg, 3510, 64) == 0
    # B=128 must chunk, and chunk 1024 is measured to overflow — the
    # policy's transient terms must keep it at or below 512.
    c128 = acoustic.auto_time_chunk(cfg, 3510, 128)
    assert 0 < c128 <= 512
    # The chunked footprint the policy claims must actually be far below
    # the whole-sequence one.
    assert acoustic.training_residual_bytes(cfg, c128, 128) * 3 < \
        acoustic.training_residual_bytes(cfg, 3510, 128)
    # f32 residuals double the footprint -> chunking engages earlier.
    cfg32 = acoustic.AcousticConfig(
        num_layers=3, hidden_size=1024, input_dim=120, num_labels=80,
        compute_dtype=jnp.float32, use_pallas=True,
    )
    assert acoustic.training_residual_bytes(cfg32, 3510, 30) > \
        acoustic.training_residual_bytes(cfg, 3510, 30)
    # Small-model shapes (unit tests, demos) stay whole-sequence.
    tiny = acoustic.AcousticConfig(
        num_layers=2, hidden_size=64, input_dim=20, num_labels=80,
        compute_dtype=jnp.bfloat16,
    )
    assert acoustic.auto_time_chunk(tiny, 400, 8) == 0
    # Frame stacking shortens T and can push a config back under budget.
    stacked = acoustic.AcousticConfig(
        num_layers=3, hidden_size=1024, input_dim=120, num_labels=80,
        compute_dtype=jnp.bfloat16, frame_stack=3,
    )
    assert acoustic.auto_time_chunk(stacked, 3510, 30) == 0


def test_training_memory_plan_prefers_whole_sequence():
    """Plan ladder: gates whole-seq -> recompute whole-seq -> chunked.
    B=64 keeps the fast gates backward; B=128 switches residual strategy
    instead of paying chunked remat's double forward."""
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic

    cfg = acoustic.AcousticConfig(
        num_layers=3, hidden_size=1024, input_dim=120, num_labels=80,
        compute_dtype=jnp.bfloat16, use_pallas=True,
    )
    assert acoustic.training_memory_plan(cfg, 3510, 64) == (0, "gates")
    # B=96 whole-sequence compiles only with recompute residuals
    # (measured); B=128 fits NO whole-sequence strategy and must chunk.
    assert acoustic.training_memory_plan(cfg, 3510, 96) == (0, "recompute")
    chunk, mode = acoustic.training_memory_plan(cfg, 3510, 128)
    assert chunk > 0 and mode == "gates"
    # The recompute footprint really is a small fraction of gates mode.
    assert acoustic.training_residual_bytes(cfg, 3510, 128, "recompute") < \
        0.45 * acoustic.training_residual_bytes(cfg, 3510, 128, "gates")
    # The scan path (no Pallas) has no recompute kernel: plan must not
    # select it there.
    scan_cfg = acoustic.AcousticConfig(
        num_layers=3, hidden_size=1024, input_dim=120, num_labels=80,
        compute_dtype=jnp.bfloat16, use_pallas=False,
    )
    _, mode = acoustic.training_memory_plan(scan_cfg, 3510, 128)
    assert mode == "gates"


def test_clip_zero_disables_clipping():
    import jax.numpy as jnp

    from rnn_speech_tpu.train import optim

    grads = {"w": jnp.ones((4,)) * 10.0}
    clipped, norm = optim.clip_by_global_norm(grads, 0.0)
    np.testing.assert_allclose(np.asarray(clipped["w"]), 10.0)
    clipped, _ = optim.clip_by_global_norm(grads, 1.0)
    assert np.abs(np.asarray(clipped["w"])).max() < 10.0


def test_metrics_ignore_padded_rows():
    """Padding rows (zero frame/label lengths) don't dilute loss/error."""
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.train import step as step_mod

    T, D, V = 30, 6, 8
    rng = np.random.default_rng(0)
    cfg = acoustic.AcousticConfig(num_layers=1, hidden_size=16, input_dim=D,
                                  num_labels=V)
    scfg = step_mod.StepConfig(model=cfg, input_keep_prob=1.0,
                               output_keep_prob=1.0)

    real_feats = rng.normal(0, 1, (2, T, D)).astype(np.float32)

    def batch_for(B, real):
        feats = np.zeros((1, B, T, D), np.float32)
        feats[0, :real] = real_feats[:real]
        labels = np.full((1, B, 5), -1, np.int32)
        labels[0, :real, :3] = [1, 2, 3]
        return {
            "features": jnp.asarray(feats),
            "frame_lengths": jnp.asarray([[T] * real + [0] * (B - real)]),
            "labels": jnp.asarray(labels),
            "label_lengths": jnp.asarray([[3] * real + [0] * (B - real)]),
        }

    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, 4, 1e-3)
    m_full = step_mod.eval_step(scfg, state, batch_for(2, 2))
    state4 = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, 4, 1e-3)
    m_padded = step_mod.eval_step(scfg, state4, batch_for(4, 2))
    np.testing.assert_allclose(float(m_padded["mean_loss"]),
                               float(m_full["mean_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_padded["mean_error_rate"]),
                               float(m_full["mean_error_rate"]), rtol=1e-5)


def test_all_padding_microbatch_does_not_dilute_metrics(toy_batch):
    """An all-padding microbatch (short final macro batch) must not lower
    the reported mean loss / error rate."""
    cfg = step_mod.StepConfig(model=make_cfg())
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.0)

    real = {k: np.asarray(v)[:1] for k, v in toy_batch.items()}
    padded = {
        "features": np.concatenate(
            [real["features"], np.zeros_like(real["features"])], axis=0
        ),
        "frame_lengths": np.concatenate(
            [real["frame_lengths"], np.zeros_like(real["frame_lengths"])], axis=0
        ),
        "labels": np.concatenate(
            [real["labels"], np.full_like(real["labels"], -1)], axis=0
        ),
        "label_lengths": np.concatenate(
            [real["label_lengths"], np.zeros_like(real["label_lengths"])], axis=0
        ),
    }
    rng = jax.random.PRNGKey(1)
    off = jnp.asarray(False)
    # lr=0 so both calls see identical parameters.
    _, m_real = step_mod.train_step(cfg, state, real, rng, off)
    state2 = step_mod.init_train_state(jax.random.PRNGKey(0), cfg.model, 3, 0.0)
    _, m_pad = step_mod.train_step(cfg, state2, padded, rng, off)
    np.testing.assert_allclose(
        float(m_pad["mean_loss"]), float(m_real["mean_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_pad["mean_error_rate"]), float(m_real["mean_error_rate"]),
        rtol=1e-5,
    )
    ev_real = step_mod.eval_step(cfg, state, real)
    ev_pad = step_mod.eval_step(cfg, state, padded)
    np.testing.assert_allclose(
        float(ev_pad["mean_loss"]), float(ev_real["mean_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(ev_pad["mean_error_rate"]), float(ev_real["mean_error_rate"]),
        rtol=1e-5,
    )
