"""Streaming featurizer parity: chunked == whole-clip (VERDICT r1 #8).

Pins rnn_speech_tpu.streaming.StreamingFbank against
frontend.extract_fbank, the repo's exact-parity DSP reference."""

import numpy as np
import pytest

from rnn_speech_tpu import frontend, streaming

SR = 22050


def make_signal(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    return (
        0.4 * np.sin(2 * np.pi * 340 * t)
        + 0.2 * np.sin(2 * np.pi * 870 * t + 1.0)
        + 0.02 * rng.normal(size=n)
    ).astype(np.float32)


def stream_in_chunks(sig, chunk):
    sf = streaming.StreamingFbank(SR)
    parts = [sf.feed(sig[i : i + chunk]) for i in range(0, len(sig), chunk)]
    parts.append(sf.flush())
    return np.concatenate([p for p in parts if p.size], axis=0)


@pytest.mark.parametrize("chunk", [22050, 4096, 1000])
def test_chunked_matches_whole_clip(chunk):
    """Any chunking: same frame count, exact Δ/ΔΔ, static channels equal
    up to the (documented) running-vs-clip mean-norm offset."""
    sig = make_signal(2.3)
    whole, n = frontend.extract_fbank(sig, SR)
    out = stream_in_chunks(sig, chunk)
    assert out.shape == whole.shape == (n, 120)

    # Δ and ΔΔ: exactly the whole-clip values for EVERY frame — the
    # savgol derivative is invariant to the mean-norm constant, and the
    # carried frame phase + edge buffering reproduce scipy's interp mode.
    np.testing.assert_allclose(out[:, 40:], whole[:, 40:], atol=2e-4)

    # Static channels: whole-clip subtracts the clip mean, streaming the
    # running mean at emission time — so per frame the difference is a
    # per-channel constant (un-normalized parity is exact).
    clip_mean_diff = out[:, :40] - whole[:, :40]
    # The last flushed frames saw the full stream: running mean == clip
    # mean, so they match exactly.
    np.testing.assert_allclose(clip_mean_diff[-1], 0.0, atol=2e-4)


def test_unnormalized_static_parity_is_exact():
    """With normalization off, chunked static log-mel equals the raw
    whole-clip banks exactly — frame phase and window math carry across
    chunk boundaries with no drift."""
    sig = make_signal(1.7, seed=3)
    raw = _raw_banks(sig)

    sf = streaming.StreamingFbank(SR, mean_norm=False)
    chunk = 3000
    parts = [sf.feed(sig[i : i + chunk]) for i in range(0, len(sig), chunk)]
    parts.append(sf.flush())
    out = np.concatenate([p for p in parts if p.size], axis=0)
    assert out.shape[0] == raw.shape[0]
    np.testing.assert_allclose(out[:, :40], raw, atol=2e-4)
    # And the whole-clip normalized output is these banks minus the clip
    # mean — the documented relationship between the two normalizations.
    whole, _ = frontend.extract_fbank(sig, SR)
    np.testing.assert_allclose(
        whole[:, :40], raw - (raw.mean(axis=0) + 1e-8), atol=2e-4
    )


def _raw_banks(sig):
    """Un-normalized log-mel rows, straight from the whole-clip DSP."""
    sig = np.asarray(sig, dtype=np.float64)
    emphasized = np.append(sig[0:1], sig[1:] - 0.97 * sig[:-1])
    flen = int(round(frontend.FRAME_SIZE * SR))
    step = int(round(frontend.FRAME_STRIDE * SR))
    num = int(np.ceil(abs(len(emphasized) - flen) / step))
    padded = np.concatenate([emphasized,
                             np.zeros(num * step + flen - len(emphasized))])
    idx = np.arange(flen)[None, :] + np.arange(num)[:, None] * step
    frames = padded[idx] * np.hamming(flen)
    mag = np.abs(np.fft.rfft(frames, frontend.FBANK_NFFT))
    power = mag**2 / frontend.FBANK_NFFT
    banks = power @ frontend.fbank_mel_matrix(SR).T
    banks = np.where(banks == 0.0, np.finfo(float).eps, banks)
    return 10.0 * np.log10(banks)


def test_random_chunking_fuzz():
    """Arbitrary (adversarial) chunk-size sequences — including 1-sample
    dribbles and empty feeds — never perturb the carried DSP state."""
    sig = make_signal(1.3, seed=7)
    whole, n = frontend.extract_fbank(sig, SR)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        sf = streaming.StreamingFbank(SR)
        parts, i = [], 0
        while i < len(sig):
            step = int(rng.choice([1, 7, 100, 221, 550, 551, 4096]))
            parts.append(sf.feed(sig[i : i + step]))
            if rng.random() < 0.1:
                parts.append(sf.feed(sig[i:i]))     # empty feed
            i += step
        parts.append(sf.flush())
        out = np.concatenate([p for p in parts if p.size], axis=0)
        assert out.shape == whole.shape, seed
        np.testing.assert_allclose(out[:, 40:], whole[:, 40:], atol=2e-4)


def test_exact_division_corner():
    """L - frame_length an exact multiple of the step: the whole-clip
    ceil formula emits one frame fewer than the complete-frame count;
    streaming must agree (the eager/flush split handles it)."""
    flen, step = int(round(0.025 * SR)), int(round(0.01 * SR))
    sig = make_signal(1.0)[: flen + 10 * step]      # exact division
    whole, n = frontend.extract_fbank(sig, SR)
    assert n == 10
    out = stream_in_chunks(sig, 1234)
    assert out.shape == whole.shape
    np.testing.assert_allclose(out[:, 40:], whole[:, 40:], atol=2e-4)


def test_short_clip_quirk_parity():
    """Clips shorter than one window: the reference's abs() framing still
    yields frames (of mostly padding); streaming reproduces the count."""
    sig = make_signal(0.02)          # 441 samples < frame_length 551
    whole, n = frontend.extract_fbank(sig, SR)
    out = stream_in_chunks(sig, 200)
    assert out.shape == whole.shape == (n, 120)


def test_transcriber_chunked_matches_whole_clip(tmp_path):
    """End-to-end: a trained model transcribes the same text whether the
    clip arrives in one piece or in 0.3 s chunks through the --record
    engine (the VERDICT r1 #8 acceptance criterion)."""
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.charmap import CharMap
    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.ops import decode as dec
    from rnn_speech_tpu.train import checkpoint as ckpt
    from rnn_speech_tpu.train import step as step_mod

    cm = CharMap()
    sig = make_signal(1.2, seed=9)
    feats, n = frontend.extract_fbank(sig, SR)
    labels, label_len = cm.encode_padded("HELLO THERE", 20)

    cfg = acoustic.AcousticConfig(
        num_layers=1, hidden_size=64, input_dim=120, num_labels=len(cm)
    )
    batch = {
        "features": jnp.asarray(feats)[None, None],
        "frame_lengths": jnp.asarray([[n]], jnp.int32),
        "labels": jnp.asarray(labels)[None, None],
        "label_lengths": jnp.asarray([[label_len]], jnp.int32),
    }
    scfg = step_mod.StepConfig(
        model=cfg, input_keep_prob=1.0, output_keep_prob=1.0
    )
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, 1, 3e-3)
    fn = jax.jit(step_mod.train_step, static_argnums=0)
    for i in range(400):
        state, metrics = fn(
            scfg, state, batch, jax.random.PRNGKey(i), jnp.asarray(True)
        )
        if i > 200 and float(metrics["mean_error_rate"]) == 0.0:
            break
    # Near-memorized is enough: the claim under test is whole == chunked,
    # not whole == truth.
    assert float(metrics["mean_error_rate"]) <= 0.15

    # Whole-clip decode (the --file path's math).
    logits, _ = acoustic.forward(
        state["params"], cfg, jnp.asarray(feats)[:, None], jnp.asarray([n]),
        acoustic.zero_state(cfg, 1),
    )
    ids, lens = dec.greedy_decode(logits, jnp.asarray([n]))
    whole_text = cm.decode(list(np.asarray(ids)[0, : int(lens[0])]))
    assert whole_text.strip() != ""

    # Chunked decode through the real --record engine, from a checkpoint.
    ckpt.save(str(tmp_path / "ckpt" / "acoustic"), state["params"], 1, 3e-3)
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[acoustic_network_params]\nnum_layers : 1\nhidden_size : 64\n"
        "dropout_input_keep_prob : 1.0\ndropout_output_keep_prob : 1.0\n"
        "batch_size : 1\nmini_batch_size : 1\nlearning_rate : 0.003\n"
        "lr_decay_factor : 0.33\ngrad_clip : 5\n"
        "signal_processing : fbank\nlanguage : english\n"
        "rnn_state_reset_ratio : 1.0\n"
        "[general]\nuse_config_file_if_checkpoint_exists : True\n"
        "steps_per_checkpoint : 2\nsteps_per_evaluation : 1000\n"
        "checkpoint_dir : {}\n"
        "[training]\ntraining_dataset_dirs :\n"
        "max_input_seq_length : 300\nmax_target_seq_length : 40\n"
        "batch_normalization : False\ndataset_size_ordering : False\n"
        "[logging]\nlog_level : WARNING\n"
        "[tpu]\ncompute_dtype : float32\nuse_pallas_lstm : False\n"
        "prefetch_depth : 0\n"
        .format(tmp_path / "ckpt")
    )
    from rnn_speech_tpu.cli import StreamingTranscriber
    from rnn_speech_tpu.config import load_config

    tr = StreamingTranscriber(load_config(str(ini)), cm, chunk_seconds=0.3)
    chunk = int(SR * 0.3)
    pieces = [tr.feed(sig[i : i + chunk]) for i in range(0, len(sig), chunk)]
    pieces.append(tr.finish())
    chunked_text = "".join(pieces)

    # Frame phase and Δ/ΔΔ carry exactly (test_chunked_matches_whole_clip),
    # so the only feature difference is the causal running mean-norm vs the
    # whole clip's non-causal mean on the EARLIEST frames — no causal
    # streamer can know the clip mean up front.  The decoded text must
    # therefore be near-identical, converging as the stream warms up; the
    # round-1 per-chunk featurization failed this bound badly (restarted
    # phase + per-chunk means shifted every frame of every chunk).
    from rnn_speech_tpu.train.metrics import calculate_cer

    distance = calculate_cer(whole_text, chunked_text)
    assert distance <= max(2, 0.2 * len(whole_text)), (
        whole_text, chunked_text
    )


def test_transcriber_beam_decode_matches_greedy_when_trained(tmp_path):
    """--record with --beam_width: the streaming engine decodes through
    the on-device beam search; on a confidently-memorized model beam and
    greedy agree."""

    # Reuse the trained checkpoint + config from the e2e test by
    # rebuilding them quickly at smaller scale.
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.charmap import CharMap
    from rnn_speech_tpu.cli import StreamingTranscriber
    from rnn_speech_tpu.config import load_config
    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.train import checkpoint as ckpt
    from rnn_speech_tpu.train import step as step_mod

    cm = CharMap()
    sig = make_signal(0.9, seed=11)
    feats, n = frontend.extract_fbank(sig, SR)
    labels, label_len = cm.encode_padded("GOOD DAY", 20)
    cfg = acoustic.AcousticConfig(
        num_layers=1, hidden_size=48, input_dim=120, num_labels=len(cm)
    )
    batch = {
        "features": jnp.asarray(feats)[None, None],
        "frame_lengths": jnp.asarray([[n]], jnp.int32),
        "labels": jnp.asarray(labels)[None, None],
        "label_lengths": jnp.asarray([[label_len]], jnp.int32),
    }
    scfg = step_mod.StepConfig(model=cfg, input_keep_prob=1.0,
                               output_keep_prob=1.0)
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, 1, 3e-3)
    fn = jax.jit(step_mod.train_step, static_argnums=0)
    for i in range(200):
        state, metrics = fn(scfg, state, batch, jax.random.PRNGKey(i),
                            jnp.asarray(True))
    ckpt.save(str(tmp_path / "ckpt" / "acoustic"), state["params"], 1, 3e-3)
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[acoustic_network_params]\nnum_layers : 1\nhidden_size : 48\n"
        "dropout_input_keep_prob : 1.0\ndropout_output_keep_prob : 1.0\n"
        "batch_size : 1\nmini_batch_size : 1\nlearning_rate : 0.003\n"
        "lr_decay_factor : 0.33\ngrad_clip : 5\n"
        "signal_processing : fbank\nlanguage : english\n"
        "rnn_state_reset_ratio : 1.0\n"
        "[general]\nuse_config_file_if_checkpoint_exists : True\n"
        "steps_per_checkpoint : 2\nsteps_per_evaluation : 1000\n"
        "checkpoint_dir : {}\n"
        "[training]\ntraining_dataset_dirs :\n"
        "max_input_seq_length : 300\nmax_target_seq_length : 40\n"
        "batch_normalization : False\ndataset_size_ordering : False\n"
        "[logging]\nlog_level : WARNING\n"
        "[tpu]\ncompute_dtype : float32\nuse_pallas_lstm : False\n"
        "prefetch_depth : 0\n".format(tmp_path / "ckpt")
    )
    config = load_config(str(ini))
    outs = {}
    for width in (1, 4):
        tr = StreamingTranscriber(config, cm, chunk_seconds=0.5,
                                  beam_width=width)
        text = tr.feed(sig) + tr.finish()
        outs[width] = text
    assert outs[1] == outs[4] and outs[1].strip() != ""
    sf = streaming.StreamingFbank(SR)
    sig = make_signal(0.8, seed=5)
    sf.feed(sig)
    first = sf.flush()
    sf.feed(sig)
    second = sf.flush()
    np.testing.assert_allclose(first, second, atol=1e-6)


def test_transcriber_decode_is_chunk_size_invariant(tmp_path):
    """The VERDICT r2 #2 acceptance: the --record engine's decoded TEXT is
    identical whether the clip arrives whole or in chunks of any size, for
    both greedy and beam decode.  The streaming featurizer is chunk-size
    invariant (test_chunked_matches_whole_clip), so this pins the decoder
    carries: greedy's prev-argmax (boundary repeats collapse) and beam's
    carried BeamState with commit-on-agreement emission."""
    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.charmap import CharMap
    from rnn_speech_tpu.cli import StreamingTranscriber
    from rnn_speech_tpu.config import load_config
    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.train import checkpoint as ckpt
    from rnn_speech_tpu.train import step as step_mod

    cm = CharMap()
    sig = make_signal(1.0, seed=21)
    feats, n = frontend.extract_fbank(sig, SR)
    labels, label_len = cm.encode_padded("NICE WORK", 20)
    cfg = acoustic.AcousticConfig(
        num_layers=1, hidden_size=48, input_dim=120, num_labels=len(cm)
    )
    batch = {
        "features": jnp.asarray(feats)[None, None],
        "frame_lengths": jnp.asarray([[n]], jnp.int32),
        "labels": jnp.asarray(labels)[None, None],
        "label_lengths": jnp.asarray([[label_len]], jnp.int32),
    }
    scfg = step_mod.StepConfig(model=cfg, input_keep_prob=1.0,
                               output_keep_prob=1.0)
    state = step_mod.init_train_state(jax.random.PRNGKey(0), cfg, 1, 3e-3)
    fn = jax.jit(step_mod.train_step, static_argnums=0)
    for i in range(250):
        state, metrics = fn(scfg, state, batch, jax.random.PRNGKey(i),
                            jnp.asarray(True))
    ckpt.save(str(tmp_path / "ckpt" / "acoustic"), state["params"], 1, 3e-3)
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[acoustic_network_params]\nnum_layers : 1\nhidden_size : 48\n"
        "dropout_input_keep_prob : 1.0\ndropout_output_keep_prob : 1.0\n"
        "batch_size : 1\nmini_batch_size : 1\nlearning_rate : 0.003\n"
        "lr_decay_factor : 0.33\ngrad_clip : 5\n"
        "signal_processing : fbank\nlanguage : english\n"
        "rnn_state_reset_ratio : 1.0\n"
        "[general]\nuse_config_file_if_checkpoint_exists : True\n"
        "steps_per_checkpoint : 2\nsteps_per_evaluation : 1000\n"
        "checkpoint_dir : {}\n"
        "[training]\ntraining_dataset_dirs :\n"
        "max_input_seq_length : 300\nmax_target_seq_length : 40\n"
        "batch_normalization : False\ndataset_size_ordering : False\n"
        "[logging]\nlog_level : WARNING\n"
        "[tpu]\ncompute_dtype : float32\nuse_pallas_lstm : False\n"
        "prefetch_depth : 0\n".format(tmp_path / "ckpt")
    )
    config = load_config(str(ini))
    for width in (1, 4):
        texts = {}
        for chunk_s in (None, 0.25, 0.11):
            tr = StreamingTranscriber(config, cm, chunk_seconds=0.5,
                                      beam_width=width)
            if chunk_s is None:
                text = tr.feed(sig) + tr.finish()
            else:
                chunk = int(SR * chunk_s)
                pieces = [tr.feed(sig[i : i + chunk])
                          for i in range(0, len(sig), chunk)]
                pieces.append(tr.finish())
                text = "".join(pieces)
            texts[chunk_s] = text
        assert texts[None].strip() != ""
        assert texts[0.25] == texts[None], (width, texts)
        assert texts[0.11] == texts[None], (width, texts)
