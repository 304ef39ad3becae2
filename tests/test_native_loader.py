"""Native async loader tests: parity with audio_io, ordering, errors."""

import os

import numpy as np
import pytest

from rnn_speech_tpu import audio_io
from rnn_speech_tpu.runtime import flac_enc, loader


pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native runtime not built"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_loader")
    rng = np.random.default_rng(0)
    paths = []

    pcm16 = (rng.normal(0, 0.2, 22050) * 20000).astype(np.int16)
    wav = str(root / "a.wav")
    audio_io.write_wav(wav, pcm16, 22050)
    paths.append(wav)

    flac = str(root / "b.flac")
    flac_enc.encode_flac(flac, (rng.normal(0, 0.2, 16000) * 20000).astype(np.int16), 16000)
    paths.append(flac)

    # Stereo WAV exercises downmixing.
    stereo = str(root / "c.wav")
    audio_io.write_wav(
        stereo, (rng.normal(0, 0.2, (8000, 2)) * 20000).astype(np.int16), 22050
    )
    paths.append(stereo)

    # SPHERE file.
    sph = str(root / "d.sph")
    pcm = (rng.normal(0, 0.2, 16000) * 20000).astype(np.int16)
    header = (
        "NIST_1A\n    1024\n"
        "channel_count -i 1\nsample_rate -i 22050\nsample_n_bytes -i 2\n"
        f"sample_count -i {len(pcm)}\nsample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\nend_head\n"
    ).encode().ljust(1024, b" ")
    with open(sph, "wb") as fh:
        fh.write(header + pcm.astype("<i2").tobytes())
    paths.append(sph)

    return paths


def test_matches_python_path_no_resample(corpus):
    """Files already at the target rate decode bit-close to audio_io.load."""
    for path in corpus:
        if audio_io.decode_audio(path)[1] != 22050:
            continue
        ref, _ = audio_io.load(path, sr=22050)
        with loader.NativeAudioLoader(
            [path], max_samples=1 << 20, target_rate=22050, n_threads=2
        ) as ld:
            _, audio, rc = next(ld)
        assert rc == 0
        np.testing.assert_allclose(audio, ref, atol=1e-6)


def test_resample_exact_vs_python_path(tmp_path):
    """The Python resampler is a tap-for-tap port of the native polyphase
    table (same Kaiser beta, zero crossings, output-length formula), so
    the two load paths must agree to float rounding on ANY content —
    including white noise.  Divergence here means a clip featurizes
    differently through ``--file`` than through the training pipeline
    (a real decode regression caught in round-2 verification)."""
    rng = np.random.default_rng(3)
    for sr_in in (16000, 48000, 8000):
        noise = (0.5 * rng.normal(size=sr_in)).astype(np.float32)
        wav = str(tmp_path / f"noise{sr_in}.wav")
        audio_io.write_wav(wav, noise, sr_in)
        ref, _ = audio_io.load(wav, sr=22050)
        with loader.NativeAudioLoader(
            [wav], max_samples=1 << 20, target_rate=22050, n_threads=1
        ) as ld:
            _, audio, rc = next(ld)
        assert rc == 0
        assert len(audio) == len(ref)
        np.testing.assert_allclose(audio, ref, atol=2e-6)


def test_resample_close_to_python_path(corpus, tmp_path):
    """16 kHz -> 22.05 kHz: native sinc vs the Python polyphase port.

    Tight agreement on bandlimited (speech-like) content; the white-noise
    FLAC gets the exactness test above."""
    t = np.arange(16000) / 16000.0
    tone = sum(np.sin(2 * np.pi * f * t + f) for f in (220.0, 880.0, 2500.0))
    wav = str(tmp_path / "tone.wav")
    audio_io.write_wav(wav, (tone / 4.0).astype(np.float32), 16000)
    ref, _ = audio_io.load(wav, sr=22050)
    with loader.NativeAudioLoader(
        [wav], max_samples=1 << 20, target_rate=22050, n_threads=1
    ) as ld:
        _, audio, rc = next(ld)
    assert rc == 0
    n = min(len(audio), len(ref))
    assert abs(len(audio) - len(ref)) <= 2
    core = slice(200, n - 200)   # ignore filter edge effects
    err = np.abs(audio[core] - ref[core])
    assert err.max() < 5e-3 and err.mean() < 1e-3

    flac = [p for p in corpus if p.endswith(".flac")][0]
    ref, _ = audio_io.load(flac, sr=22050)
    with loader.NativeAudioLoader(
        [flac], max_samples=1 << 20, target_rate=22050, n_threads=1
    ) as ld:
        _, audio, rc = next(ld)
    n = min(len(audio), len(ref))
    err = np.abs(audio[200 : n - 200] - ref[200 : n - 200])
    assert err.max() < 5e-2 and err.mean() < 1e-2


def test_order_and_truncation(corpus):
    order = corpus[::-1]
    with loader.NativeAudioLoader(
        order, max_samples=1000, target_rate=22050, n_threads=3, capacity=2
    ) as ld:
        got = list(ld)
    assert [i for i, _, _ in got] == list(range(len(order)))
    assert all(rc == 0 for _, _, rc in got)
    assert all(len(a) <= 1000 for _, a, _ in got)


def test_bad_file_reports_nonzero_rc(corpus, tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as fh:
        fh.write(b"RIFFgarbage")
    missing = str(tmp_path / "missing.flac")
    with loader.NativeAudioLoader(
        [corpus[0], bad, missing], max_samples=1 << 20, target_rate=22050,
        n_threads=2,
    ) as ld:
        results = list(ld)
    assert results[0][2] == 0
    assert results[1][2] != 0 and results[1][1] is None
    assert results[2][2] != 0


def test_pipeline_native_equals_sync(corpus):
    """Batches from the native-loader pipeline == synchronous pipeline."""
    from rnn_speech_tpu.models.recognizer import SpeechRecognizer
    from rnn_speech_tpu.train import pipeline as pipe_mod

    char_map = SpeechRecognizer("english").get_char_map()
    dataset = [[p, "hello world", 1.0] for p in corpus]
    base = dict(
        batch_size=2, mini_batch_size=2, max_input_seq_length=120,
        max_target_seq_length=20, signal_processing="fbank",
    )
    sync_cfg = pipe_mod.PipelineConfig(**base, num_workers=0)
    native_cfg = pipe_mod.PipelineConfig(**base, num_workers=2,
                                         use_native_loader=True)
    sync_batches = list(pipe_mod.InputPipeline(dataset, char_map, sync_cfg))
    native_batches = list(pipe_mod.InputPipeline(dataset, char_map, native_cfg))
    assert len(sync_batches) == len(native_batches)
    for sb, nb in zip(sync_batches, native_batches):
        assert sorted(sb.keys()) == sorted(nb.keys())
        np.testing.assert_array_equal(sb["labels"], nb["labels"])
        np.testing.assert_array_equal(sb["label_lengths"], nb["label_lengths"])
        # Audio equal where no resampling happened; close elsewhere.
        assert sb["audio"].shape == nb["audio"].shape
        np.testing.assert_allclose(
            sb["audio_lengths"], nb["audio_lengths"], atol=2
        )
        # Value parity, not just shapes: compare the overlapping prefix of
        # each row (native/scipy resampled lengths can differ by a sample
        # or two; near-Nyquist filter rolloff differs slightly on noise).
        mb_count, b_count = sb["audio_lengths"].shape
        for m in range(mb_count):
            for b in range(b_count):
                n = int(min(sb["audio_lengths"][m, b],
                            nb["audio_lengths"][m, b]))
                if n <= 400:
                    continue
                core = slice(200, n - 200)
                err = np.abs(sb["audio"][m, b, core] - nb["audio"][m, b, core])
                assert err.max() < 5e-2 and err.mean() < 1e-2


def test_float_wav_rejected(corpus, tmp_path):
    """Non-PCM WAV (IEEE float fmt tag) reports a decode error, not silence."""
    import struct, wave

    bad = str(tmp_path / "float.wav")
    n = 1000
    data = np.zeros(n, np.float32).tobytes()
    # Hand-build a fmt-tag-3 (IEEE float) WAV.
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 22050, 22050 * 4, 4, 32)
    dat = b"data" + struct.pack("<I", len(data)) + data
    with open(bad, "wb") as fh:
        fh.write(hdr + fmt + dat)
    with loader.NativeAudioLoader(
        [bad], max_samples=1 << 16, target_rate=22050, n_threads=1
    ) as ld:
        _, audio, rc = next(ld)
    assert rc != 0 and audio is None


def test_large_list_lazy_submission(corpus):
    """Iterator startup is O(capacity) — large lists do not pre-submit."""
    paths = list(corpus) * 50   # 200 files
    with loader.NativeAudioLoader(
        paths, max_samples=1 << 20, target_rate=22050, n_threads=2, capacity=4
    ) as ld:
        assert ld._submitted <= 2 * 4 + 4   # window, not len(paths)
        got = 0
        for _, a, rc in ld:
            got += rc == 0
            # Submission is anchored to items delivered: in-flight work
            # stays bounded by the window for the whole iteration, not
            # just at startup.
            assert ld._submitted - ld._delivered <= 2 * 4 + 4
    assert got == len(paths)


def test_non_consecutive_submit_indices(corpus):
    """The extern-C delivery contract is submission order over arbitrary
    unique indices — not indices-consecutive-from-0 (a raw-API caller
    submitting e.g. index 5 first must not hang forever)."""
    import ctypes

    from rnn_speech_tpu.runtime import audiodec
    from rnn_speech_tpu.runtime.loader import _bind

    lib = _bind(audiodec.get_native_lib())
    handle = lib.rst_loader_create(1, 1 << 20, 22050, 8)
    try:
        for idx in (5, 2, 40):
            lib.rst_loader_submit(handle, idx, corpus[0].encode())
        lib.rst_loader_close(handle)
        buf = np.empty((1 << 20,), np.float32)
        seen = []
        # Bounded loop: a regression back to consecutive-from-0 delivery
        # blocks in rst_loader_next forever — better a failed bound than a
        # hung suite, so drain at most the submitted count.
        for _ in range(4):
            index = ctypes.c_int64()
            n = ctypes.c_int64()
            rc = lib.rst_loader_next(
                handle, ctypes.byref(index),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                1 << 20, ctypes.byref(n),
            )
            if rc == -1:
                break
            assert rc == 0 and n.value > 0
            seen.append(index.value)
        assert seen == [5, 2, 40]
    finally:
        lib.rst_loader_destroy(handle)


def test_fuzz_no_crashes(tmp_path):
    """Mutated/truncated containers must reject or decode — never crash the
    worker threads (a native segfault would kill training)."""
    rng = np.random.default_rng(0)
    base_wav = str(tmp_path / "b.wav")
    audio_io.write_wav(base_wav,
                       (rng.normal(0, 0.2, 2000) * 20000).astype(np.int16),
                       16000)
    base_flac = str(tmp_path / "b.flac")
    flac_enc.encode_flac(base_flac,
                         (rng.normal(0, 0.2, 2000) * 20000).astype(np.int16),
                         16000)
    paths = []
    for tag, base in (("w", base_wav), ("f", base_flac)):
        data = bytearray(open(base, "rb").read())
        for i in range(25):
            mutated = bytearray(data)
            for _ in range(rng.integers(1, 8)):
                mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
            p = str(tmp_path / f"{tag}{i}.bin")
            open(p, "wb").write(bytes(mutated))
            paths.append(p)
        for i in range(10):
            p = str(tmp_path / f"{tag}t{i}.bin")
            open(p, "wb").write(bytes(data[: rng.integers(1, len(data))]))
            paths.append(p)
    with loader.NativeAudioLoader(paths, max_samples=1 << 15,
                                  target_rate=22050, n_threads=4) as ld:
        results = list(ld)
    assert len(results) == len(paths)   # every file answered, none wedged
