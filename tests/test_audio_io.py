"""Audio container IO tests: WAV/SPHERE roundtrips, FLAC decode paths."""

import numpy as np
import pytest

from rnn_speech_tpu import audio_io
from rnn_speech_tpu.runtime import audiodec, flac_enc, flac_py


@pytest.fixture(scope="module")
def pcm16():
    rng = np.random.default_rng(42)
    t = np.arange(16000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=16000)
    return (np.clip(sig, -1, 1) * 32000).astype(np.int16)


def test_wav_roundtrip(tmp_path, pcm16):
    path = str(tmp_path / "a.wav")
    audio_io.write_wav(path, pcm16.astype(np.float32) / 32768.0, 16000)
    data, rate = audio_io.read_wav(path)
    assert rate == 16000
    assert data.shape == (16000, 1)
    np.testing.assert_allclose(
        data[:, 0], pcm16.astype(np.float32) / 32768.0, atol=2e-4
    )


def test_wav_duration_probe(tmp_path, pcm16):
    path = str(tmp_path / "a.wav")
    audio_io.write_wav(path, pcm16, 16000)
    assert audio_io.probe_duration(path) == pytest.approx(1.0)


def test_sphere_roundtrip(tmp_path, pcm16):
    path = str(tmp_path / "a.sph")
    header = (
        b"NIST_1A\n    1024\n"
        b"sample_rate -i 16000\n"
        b"channel_count -i 1\n"
        b"sample_n_bytes -i 2\n"
        b"sample_byte_format -s2 01\n"
        b"sample_count -i 16000\n"
        b"end_head\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.ljust(1024, b" "))
        fh.write(pcm16.astype("<i2").tobytes())
    data, rate = audio_io.read_sphere(path)
    assert rate == 16000
    np.testing.assert_allclose(data[:, 0] * 32768.0, pcm16, atol=0.5)
    assert audio_io.probe_duration(path) == pytest.approx(1.0)

    wav_out = str(tmp_path / "seg.wav")
    audio_io.sphere_segment_to_wav(path, wav_out, 0.25, 0.75)
    seg, seg_rate = audio_io.read_wav(wav_out)
    assert seg_rate == 16000
    assert len(seg) == 8000
    np.testing.assert_allclose(seg[:, 0] * 32768.0, pcm16[4000:12000], atol=1.0)


@pytest.mark.parametrize("subframe", ["verbatim", "constant", "fixed2"])
def test_flac_python_decoder_roundtrip(tmp_path, pcm16, subframe):
    path = str(tmp_path / f"{subframe}.flac")
    pcm = np.zeros_like(pcm16) + 100 if subframe == "constant" else pcm16
    flac_enc.encode_flac(path, pcm, 16000, subframe=subframe)
    data, rate = flac_py.decode_flac(path)
    assert rate == 16000
    np.testing.assert_allclose(data[:, 0] * 32768.0, pcm, atol=0.5)


def test_flac_stereo_roundtrip(tmp_path, pcm16):
    path = str(tmp_path / "stereo.flac")
    stereo = np.stack([pcm16, -pcm16], axis=1)
    flac_enc.encode_flac(path, stereo, 16000)
    data, rate = flac_py.decode_flac(path)
    assert data.shape == (16000, 2)
    np.testing.assert_allclose(data * 32768.0, stereo, atol=0.5)


def test_flac_duration_probe(tmp_path, pcm16):
    path = str(tmp_path / "a.flac")
    flac_enc.encode_flac(path, pcm16, 16000)
    assert audio_io.probe_duration(path) == pytest.approx(1.0)


def test_flac_native_decoder_matches_python(tmp_path, pcm16):
    path = str(tmp_path / "a.flac")
    flac_enc.encode_flac(path, pcm16, 16000)
    ref, ref_rate = flac_py.decode_flac(path)

    if audiodec.get_native_lib() is None:
        pytest.skip("native runtime unavailable (no C++ toolchain)")
    out, rate = audiodec.decode_flac_native(path)
    assert rate == ref_rate
    np.testing.assert_array_equal(out, ref)


def test_load_resamples_and_mono(tmp_path, pcm16):
    path = str(tmp_path / "st.wav")
    stereo = np.stack([pcm16, pcm16], axis=1).astype(np.float32) / 32768.0
    audio_io.write_wav(path, stereo, 16000)
    sig, sr = audio_io.load(path, sr=8000)
    assert sr == 8000
    assert sig.ndim == 1
    assert abs(len(sig) - 8000) <= 1


def test_unrecognized_container(tmp_path):
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as fh:
        fh.write(b"\x00\x01\x02\x03garbage")
    with pytest.raises(audio_io.AudioFormatError):
        audio_io.probe_duration(path)
    with pytest.raises(audio_io.AudioFormatError):
        audio_io.decode_audio(path)
