"""Corpus-reader tests over synthesized fixtures for all four layouts."""

import os

import numpy as np
import pytest

from rnn_speech_tpu import audio_io, corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")

    # LibriSpeech layout: .trans.txt + sibling .flac files.
    libri = root / "Libri" / "train-clean-100" / "19" / "198"
    libri.mkdir(parents=True)
    (libri / "19-198.trans.txt").write_text(
        "19-198-0000 NORTHANGER ABBEY\n"
        "19-198-0001 THIS LITTLE WORK...\n"
        "19-198-0002 NEITHER THE...\n"
    )
    from rnn_speech_tpu.runtime import flac_enc

    rng = np.random.default_rng(0)
    pcm = (rng.normal(0, 0.05, 16000) * 32767).astype(np.int16)
    flac_enc.encode_flac(str(libri / "19-198-0000.flac"), pcm, 16000)
    flac_enc.encode_flac(str(libri / "19-198-0001.flac"), pcm, 16000)
    # 0002 has no audio file -> must be filtered.

    # Shtooka layout: index.tags.txt INI.
    shtooka = root / "Shtooka" / "flac"
    shtooka.mkdir(parents=True)
    (shtooka / "index.tags.txt").write_text(
        "\\Swac_Index_Tags\n\n"
        "[GLOBAL]\n"
        "SWAC_LANG = eng\n\n"
        "[eng - I_arose.flac]\n"
        "SWAC_TEXT = I arose\n\n"
        "[eng - I_ate.flac]\n"
        "SWAC_TEXT = I ate\n\n"
        "[eng - I_awoke.flac]\n"
        "SWAC_TEXT = I awoke\n"
    )
    flac_enc.encode_flac(str(shtooka / "eng - I_arose.flac"), pcm, 16000)
    flac_enc.encode_flac(str(shtooka / "eng - I_ate.flac"), pcm, 16000)

    # Vystadial layout: .wav + .wav.trn.
    vysta = root / "Vystadial_2013" / "data_voip_en" / "dev"
    vysta.mkdir(parents=True)
    wav_name = "jurcic-028-121024_234433_0013625_0013836.wav"
    audio_io.write_wav(str(vysta / wav_name), pcm.astype(np.float32) / 32768.0, 16000)
    (vysta / (wav_name + ".trn")).write_text("ALRIGHT THANK YOU AND GOODBYE\n")
    (vysta / "no_audio.wav.trn").write_text("FILE WITH NO AUDIO...\n")

    # TEDLIUM layout: .stm + sibling sph/ dir.
    ted_stm = root / "TEDLIUM" / "test" / "stm"
    ted_sph = root / "TEDLIUM" / "test" / "sph"
    ted_stm.mkdir(parents=True)
    ted_sph.mkdir(parents=True)
    (ted_stm / "AimeeMullins_2009P.stm").write_text(
        "AimeeMullins_2009P 1 inter_segment_gap 0 17.82 <o,,unknown> "
        "ignore_time_segment_in_scoring\n"
        "AimeeMullins_2009P 1 AimeeMullins 0.5 1.5 <o,f0,female> "
        "i 'd like to share ...\n"
    )
    # A real 2-second SPHERE file so native segment extraction works.
    sph_pcm = (rng.normal(0, 0.05, 32000) * 32767).astype("<i2")
    header = (
        b"NIST_1A\n    1024\n"
        b"sample_rate -i 16000\n"
        b"channel_count -i 1\n"
        b"sample_n_bytes -i 2\n"
        b"sample_byte_format -s2 01\n"
        b"sample_count -i 32000\n"
        b"sample_coding -s3 pcm\n"
        b"end_head\n"
    )
    with open(ted_sph / "AimeeMullins_2009P.sph", "wb") as fh:
        fh.write(header.ljust(1024, b" "))
        fh.write(sph_pcm.tobytes())

    return root


def test_detect_type(corpus_dir):
    assert corpus.detect_type(str(corpus_dir / "Libri")) == "LibriSpeech"
    assert corpus.detect_type(str(corpus_dir / "Shtooka")) == "Shtooka"
    assert corpus.detect_type(str(corpus_dir / "Vystadial_2013")) == "Vystadial_2013"
    assert corpus.detect_type(str(corpus_dir / "TEDLIUM")) == "TEDLIUM"
    assert corpus.detect_type(str(corpus_dir)) != "Unrecognized"


def test_librispeech_reader(corpus_dir):
    data = corpus.read_librispeech(str(corpus_dir / "Libri"))
    labels = sorted(item[1] for item in data)
    assert labels == ["northanger abbey", "this little work"]
    assert all(os.path.exists(item[0]) for item in data)


def test_shtooka_reader(corpus_dir):
    data = corpus.read_shtooka(str(corpus_dir / "Shtooka"))
    labels = sorted(item[1] for item in data)
    assert labels == ["i arose", "i ate"]


def test_vystadial_reader(corpus_dir):
    data = corpus.read_vystadial(str(corpus_dir / "Vystadial_2013"))
    assert len(data) == 1
    assert data[0][1] == "alright thank you and goodbye"


def test_tedlium_reader_native_sph_extraction(corpus_dir):
    data = corpus.read_tedlium(str(corpus_dir / "TEDLIUM"))
    assert len(data) == 1
    wav_path, label, _ = data[0]
    # Strip happens before punctuation removal, so "... " leaves a tail space.
    assert label == "i 'd like to share "
    # Native extraction produced a real 1-second wav.
    assert os.path.exists(wav_path)
    assert abs(audio_io.probe_duration(wav_path) - 1.0) < 0.01


def test_dataprocessor_end_to_end(corpus_dir, tmp_path):
    cache = tmp_path / "filelist.cache"
    dp = corpus.DataProcessor(
        str(corpus_dir / "Libri"), file_cache=str(cache), min_audio_size=0.1
    )
    data = dp.get_dataset()
    assert len(data) == 2
    for _, label, duration in data:
        assert duration == pytest.approx(1.0, abs=0.01)

    # Second construction must come from the cache.
    assert cache.exists()
    dp2 = corpus.DataProcessor(
        str(corpus_dir / "Libri"), file_cache=str(cache), min_audio_size=0.1
    )
    assert dp2.get_dataset() == data


def test_dataprocessor_filters(corpus_dir):
    # min_audio_size above fixture duration filters everything -> but the
    # constructor itself only raises when *no raw files* exist.
    dp = corpus.DataProcessor(str(corpus_dir / "Libri"), min_audio_size=5.0)
    assert dp.get_dataset() == []


def test_dataprocessor_unknown_dir(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError):
        corpus.DataProcessor(str(tmp_path / "empty"))
