"""Frontend tests: host numpy reference + device (JAX) parity."""

import numpy as np
import pytest
from scipy.signal import savgol_filter

from rnn_speech_tpu import frontend
from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend, featurize


@pytest.fixture(scope="module")
def sig():
    rng = np.random.default_rng(3)
    sr = 22050
    t = np.arange(sr) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1300 * t + 0.4)
        + 0.02 * rng.normal(size=sr)
    ).astype(np.float32)
    return x, sr


# ----------------------------------------------------------------- host path

def test_fbank_shape_and_dim(sig):
    x, sr = sig
    feats, length = frontend.extract_fbank(x, sr)
    assert feats.shape[1] == 120
    assert length == feats.shape[0]
    # 1s @ 22050: ceil((22050 - 551)/220) = 98 frames.
    assert length == 98


def test_fbank_mean_normalized(sig):
    x, sr = sig
    feats, _ = frontend.extract_fbank(x, sr)
    # Static banks are mean-normalized per filter over time (to ~ -1e-8).
    np.testing.assert_allclose(feats[:, :40].mean(axis=0), -1e-8, atol=1e-4)


def test_mfcc_shape(sig):
    x, sr = sig
    feats, length = frontend.extract_mfcc(x, sr)
    assert feats.shape == (length, 20)
    assert length == 1 + (len(x) - 1) // 220


def test_savgol_delta_matches_scipy(sig):
    x, sr = sig
    feats, _ = frontend.extract_fbank(x, sr)
    banks = feats[:, :40].T
    ref = savgol_filter(banks.astype(np.float64), 9, polyorder=1, deriv=1, mode="interp")
    np.testing.assert_allclose(feats[:, 40:80].T, ref, atol=1e-3)


def test_audio_processor_truncation(sig):
    x, sr = sig
    ap = frontend.AudioProcessor(50, "fbank")
    feats, length = ap.process_signal(x, sr)
    assert feats.shape == (50, 120)
    assert length == 98  # true pre-truncation length is reported


def test_audio_processor_feature_sizes():
    assert frontend.AudioProcessor(10, "mfcc").feature_size == 20
    assert frontend.AudioProcessor(10, "fbank").feature_size == 120
    with pytest.raises(ValueError):
        frontend.AudioProcessor(10, "bogus")


def test_mfcc_length_from_duration():
    # 2.0 // 0.01 is 199.0 in binary float, so the estimate is 198.
    assert frontend.AudioProcessor.get_mfcc_length_from_duration(2.0) == 198


def test_host_short_and_empty_clips_do_not_crash():
    """Clips under the Savitzky-Golay window (~0.105 s) and empty signals
    must featurize (or yield 0 frames), never raise out of the DSP."""
    sr = 22050
    rng = np.random.default_rng(0)
    for n in [0, 50, 100, 551, 1500]:
        x = rng.normal(0, 0.2, n).astype(np.float32)
        feats, length = frontend.extract_fbank(x, sr)
        assert feats.shape[1] == frontend.FBANK_DIM
        assert len(feats) == length
        assert np.isfinite(feats).all()
        feats_m, length_m = frontend.extract_mfcc(x, sr)
        assert feats_m.shape[1] == frontend.MFCC_DIM
        assert len(feats_m) == length_m
        assert np.isfinite(feats_m).all()


def test_short_fbank_delta_fallback_values():
    """For clips under DELTA_WIDTH frames, the deltas must equal the
    Savitzky-Golay fit over the edge-padded banks (trimmed), and the static
    40 bank dims must be untouched by the fallback."""
    sr = 22050
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.2, 1200).astype(np.float32)   # ~5 frames < width 9
    feats, n = frontend.extract_fbank(x, sr)
    assert 0 < n < frontend.DELTA_WIDTH
    banks = feats[:, :40].T.astype(np.float64)        # (nfilt, n)
    padded = np.pad(
        banks, ((0, 0), (0, frontend.DELTA_WIDTH - n)), mode="edge"
    )
    d1 = savgol_filter(padded, frontend.DELTA_WIDTH, 1, deriv=1,
                       mode="interp")[:, :n]
    d2 = savgol_filter(
        savgol_filter(padded, frontend.DELTA_WIDTH, 1, deriv=1, mode="interp"),
        frontend.DELTA_WIDTH, 1, deriv=1, mode="interp",
    )[:, :n]
    np.testing.assert_allclose(feats[:, 40:80].T, d1, atol=1e-4)
    np.testing.assert_allclose(feats[:, 80:].T, d2, atol=1e-4)


def test_device_fbank_short_clip_matches_host_delta_fallback():
    """Clips under DELTA_WIDTH frames: the device delta (short-row head-fit
    override) must match the host's edge-pad-and-trim fallback, including
    the delta dims — not just the static banks."""
    sr = 22050
    rng = np.random.default_rng(3)
    max_samples = sr
    n_short = 1200                      # ~3 frames < DELTA_WIDTH
    x = rng.normal(0, 0.2, n_short).astype(np.float32)
    fe = DeviceFrontend("fbank", sr=sr, max_samples=max_samples)
    batch = np.zeros((1, max_samples), np.float32)
    batch[0, :n_short] = x
    feats, nf = featurize(fe, batch, np.array([n_short], np.int32))
    host, n_host = frontend.extract_fbank(x, sr)
    assert 0 < n_host < frontend.DELTA_WIDTH
    assert int(nf[0]) == n_host
    scale = max(1.0, np.abs(host).max())
    np.testing.assert_allclose(
        np.asarray(feats)[0, :n_host] / scale, host / scale, atol=2e-3
    )


def test_device_mfcc_short_clip_matches_host_constant_pad():
    """Clips of at most n_fft//2 samples: the host falls back to constant
    padding; the device path must match it, not reflect garbage."""
    sr = 22050
    rng = np.random.default_rng(2)
    max_samples = sr
    n_short = 150                       # <= pad = 551 // 2 = 275
    x = rng.normal(0, 0.2, n_short).astype(np.float32)
    fe = DeviceFrontend("mfcc", sr=sr, max_samples=max_samples)
    batch = np.zeros((1, max_samples), np.float32)
    batch[0, :n_short] = x
    feats, nf = featurize(fe, batch, np.array([n_short], np.int32))
    host, n_host = frontend.extract_mfcc(x, sr)
    assert int(nf[0]) == n_host
    scale = max(1.0, np.abs(host).max())
    np.testing.assert_allclose(
        np.asarray(feats)[0, :n_host] / scale, host / scale, atol=2e-3
    )


# --------------------------------------------------------------- device path

@pytest.mark.parametrize("feature_type", ["fbank", "mfcc"])
def test_device_matches_host_full_length(sig, feature_type):
    x, sr = sig
    fe = DeviceFrontend(feature_type, sr=sr, max_samples=len(x))
    feats_dev, nf = featurize(
        fe, np.asarray(x)[None, :], np.array([len(x)], dtype=np.int32)
    )
    feats_dev = np.asarray(feats_dev[0])
    nf = int(nf[0])

    extract = frontend.extract_fbank if feature_type == "fbank" else frontend.extract_mfcc
    feats_host, length = extract(x, sr)
    assert nf == length
    scale = max(1.0, np.abs(feats_host).max())
    np.testing.assert_allclose(
        feats_dev[:nf] / scale, feats_host / scale, atol=2e-3
    )


@pytest.mark.parametrize("feature_type", ["fbank", "mfcc"])
def test_device_padded_batch_matches_per_example(sig, feature_type):
    """A short clip inside a padded batch must featurize as if alone."""
    x, sr = sig
    short = x[: sr // 2]
    max_samples = len(x)
    fe = DeviceFrontend(feature_type, sr=sr, max_samples=max_samples)

    batch = np.zeros((2, max_samples), dtype=np.float32)
    batch[0, :] = x
    batch[1, : len(short)] = short
    lengths = np.array([len(x), len(short)], dtype=np.int32)
    feats, nf = featurize(fe, batch, lengths)
    feats = np.asarray(feats)

    extract = frontend.extract_fbank if feature_type == "fbank" else frontend.extract_mfcc
    host_short, len_short = extract(short, sr)
    assert int(nf[1]) == len_short
    scale = max(1.0, np.abs(host_short).max())
    np.testing.assert_allclose(
        feats[1, :len_short] / scale, host_short / scale, atol=2e-3
    )
    # Padding region must be exactly zero.
    assert np.all(feats[1, len_short:] == 0.0)


def test_device_num_frames_matches_host_formula(sig):
    x, sr = sig
    fe = DeviceFrontend("fbank", sr=sr, max_samples=22050)
    fe_m = DeviceFrontend("mfcc", sr=sr, max_samples=22050)
    for n in [22050, 22000, 11111, 3000, 8820]:
        dev = int(fe.num_frames_for(np.array([n]))[0])
        _, host_n = frontend.extract_fbank(x[:n], sr)
        assert dev == host_n, f"fbank mismatch at n={n}: {dev} vs {host_n}"

        dev_m = int(fe_m.num_frames_for(np.array([n]))[0])
        _, host_m = frontend.extract_mfcc(x[:n], sr)
        assert dev_m == host_m, f"mfcc mismatch at n={n}: {dev_m} vs {host_m}"


def test_device_frontend_shape_polymorphic():
    """Feeding a narrower buffer yields the same features for clips that
    fit — the bucketed pipeline relies on width-invariance."""
    import jax.numpy as jnp

    from rnn_speech_tpu.ops.frontend_jax import DeviceFrontend

    sr = 22050
    full = sr * 2
    rng = np.random.default_rng(5)
    sig = rng.normal(0, 0.3, sr).astype(np.float32)      # 1 s clip
    for kind in ("fbank", "mfcc"):
        fe = DeviceFrontend(kind, sr=sr, max_samples=full)
        pad_full = np.zeros((1, full), np.float32)
        pad_full[0, : len(sig)] = sig
        pad_half = np.zeros((1, full // 2 + 100), np.float32)
        pad_half[0, : len(sig)] = sig
        lengths = jnp.asarray([len(sig)], jnp.int32)
        f_full, n_full = fe(jnp.asarray(pad_full), lengths)
        f_half, n_half = fe(jnp.asarray(pad_half), lengths)
        assert int(n_full[0]) == int(n_half[0])
        nf = int(n_full[0])
        np.testing.assert_allclose(
            np.asarray(f_half)[0, :nf], np.asarray(f_full)[0, :nf],
            atol=2e-4, rtol=1e-4,
        )


# ------------------------------------------------------- fused pallas kernel

@pytest.mark.parametrize("sr", [22050, 16000])
def test_fbank_pallas_kernel_matches_xla(sr):
    """The fused spectrogram kernel (interpret mode on CPU) must match the
    XLA view-matmul path bit-closely through the full frontend."""
    rng = np.random.default_rng(7)
    max_samples = sr * 2
    x = rng.normal(0, 0.2, (3, max_samples)).astype(np.float32)
    lens = np.asarray([max_samples, max_samples // 2, max_samples // 3],
                      np.int32)

    import rnn_speech_tpu.ops.frontend_pallas as fpal

    fe_x = DeviceFrontend("fbank", sr=sr, max_samples=max_samples,
                          use_pallas=False)
    fe_p = DeviceFrontend("fbank", sr=sr, max_samples=max_samples,
                          use_pallas=True)
    orig = fpal.fbank_banks_pallas
    # CPU test platform: run the kernel in interpret mode.
    fpal_interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    fpal.fbank_banks_pallas = fpal_interp
    try:
        feats_p, nf_p = fe_p(x, lens)
    finally:
        fpal.fbank_banks_pallas = orig
    feats_x, nf_x = fe_x(x, lens)
    assert np.array_equal(np.asarray(nf_p), np.asarray(nf_x))
    scale = max(1.0, np.abs(np.asarray(feats_x)).max())
    np.testing.assert_allclose(
        np.asarray(feats_p) / scale, np.asarray(feats_x) / scale, atol=2e-3
    )
