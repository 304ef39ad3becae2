"""Label-codec contract tests.

The integer/one-hot vectors here pin the exact codec contract the reference
established (see /root/reference/util/test_dataProcessor.py:132-229): the
same text must map to the same label ids so datasets and checkpoints remain
interchangeable.
"""

import numpy as np
import pytest

from rnn_speech_tpu.charmap import (
    ENGLISH_CHAR_MAP,
    CharMap,
    clean_label,
    get_char_map,
)


@pytest.fixture(scope="module")
def cm():
    return CharMap(ENGLISH_CHAR_MAP)


def test_char_map_shape(cm):
    assert len(ENGLISH_CHAR_MAP) == 80
    assert ENGLISH_CHAR_MAP[0] == "'d"
    assert ENGLISH_CHAR_MAP[-1] == "_"
    assert cm.eos_id == 79


def test_clean_label():
    assert clean_label("  What ! I'm not... ") == "what i'm not"
    # The collapse is a single pass: triple spaces leave a residual pair.
    assert clean_label("a   b") == "a  b"
    assert clean_label("A-B_C") == "a b c"
    assert clean_label("Hello, world.") == "hello world"


def test_roundtrip(cm):
    text = "What ! I'm not looking for... I'll do it..."
    cleaned = clean_label(text)
    ids = cm.encode(cleaned)
    assert cm.decode(ids) == cleaned


def test_three_char_token_at_end(cm):
    assert cm.encode(clean_label("it'll")) == [60, 45, 1, 79]


def test_first_map_entry(cm):
    assert cm.encode(clean_label("'d")) == [0, 79]


def test_capitalization_marks_word_starts(cm):
    # "i will" -> "IWill_" with "ll" as a single token.
    ids = cm.encode("i will")
    assert ids == [60, 74, 34, 16, 79]


def test_decode_drops_out_of_range(cm):
    assert cm.decode([60, 999, -3, 45]) == "it"


def test_decode_removes_single_eos(cm):
    # Only one EOS occurrence is removed.
    ids = [60, 79, 79]
    assert cm.decode(ids) == "i_"


def test_one_hot_first_item(cm):
    vec = cm.one_hot("'d")
    assert vec.shape == (2, 80)
    assert vec[0, 0] == 1.0 and vec[0].sum() == 1.0
    assert vec[1, 79] == 1.0 and vec[1].sum() == 1.0


def test_one_hot_eos_only(cm):
    vec = cm.one_hot("_", add_eos=False)
    assert vec.shape == (1, 80)
    assert vec[0, 79] == 1.0 and vec[0].sum() == 1.0


def test_one_hot_double_letter(cm):
    vec = cm.one_hot("bb", add_eos=False)
    assert vec.shape == (1, 80)
    assert vec[0, 8] == 1.0 and vec[0].sum() == 1.0


def test_unknown_char_truncates(cm):
    ids = cm.encode("ab#cd")
    # Encoding aborts at '#': only "Ab" survives, plus EOS.
    assert ids == [52 + 0, 27, 79]


def test_encode_padded(cm):
    arr, length = cm.encode_padded("it'll", max_len=8)
    assert arr.shape == (8,)
    assert length == 4
    np.testing.assert_array_equal(arr[:4], [60, 45, 1, 79])
    assert (arr[4:] == -1).all()


def test_encode_padded_truncates(cm):
    arr, length = cm.encode_padded("it'll", max_len=2)
    assert length == 2
    np.testing.assert_array_equal(arr, [60, 45])


def test_get_char_map_registry():
    assert len(get_char_map("english")) == 80
    with pytest.raises(ValueError):
        get_char_map("klingon")


def test_word_boundary_double_letters_roundtrip():
    """Word seams like 'that the' must not collapse into double-letter
    tokens (the reference's lowercased window matching lost the space)."""
    from rnn_speech_tpu.charmap import CharMap

    cm = CharMap()
    for text in ("that the", "was seen", "his son", "at times", "will link"):
        assert cm.decode(cm.encode(text)) == text


def test_random_sentence_roundtrip():
    """Property: any sentence of lowercase words survives encode/decode."""
    import random

    from rnn_speech_tpu.charmap import CharMap

    cm = CharMap()
    rng = random.Random(0)
    letters = "abcdefghijklmnopqrstuvwxyz'"
    for _ in range(200):
        words = [
            "".join(rng.choice(letters) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 6))
        ]
        # Apostrophes can't start/end a word in the codec's grammar.
        words = [w.strip("'") or "a" for w in words]
        text = " ".join(words)
        assert cm.decode(cm.encode(text)) == text, text


def test_space_before_apostrophe_is_reference_lossy():
    """A word boundary before an apostrophe-initial token is unrepresentable
    in the reference's char map (word starts are marked by capitalizing a
    LETTER; ``'`` has no capital form), so "s 'p" round-trips to "s'p" —
    byte-identical to the reference's own behavior (verified against
    /root/reference/util/dataprocessor.py), not a codec bug here."""
    from rnn_speech_tpu.charmap import get_char_map

    cm = get_char_map("english")
    for s, lossy in [("s 'p", "s'p"), ("a 'll b", "a'll b")]:
        assert cm.decode(cm.encode(s, add_eos=False)) == lossy


def test_parity_against_reference_codec():
    """Direct behavioral parity with the reference's label codec
    (/root/reference/util/dataprocessor.py get_str_labels/get_labels_str)
    on random sentences, wherever the reference's own roundtrip is
    lossless.  Where its roundtrip loses word boundaries (its lowercased
    window matching — see README 'Documented deviations'), ours must still
    reproduce the input exactly.  Skipped when the reference checkout is
    not available."""
    import importlib
    import os
    import random
    import sys
    import types

    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        pytest.skip("reference checkout not available")
    # The reference module imports mutagen (unavailable here) at module
    # scope; the codec statics don't use it, so stub it out.
    sys.modules.setdefault("mutagen", types.ModuleType("mutagen"))
    sys.path.insert(0, ref_root)
    try:
        ref = importlib.import_module("util.dataprocessor")
    finally:
        sys.path.remove(ref_root)

    from rnn_speech_tpu.charmap import (ENGLISH_CHAR_MAP, clean_label,
                                        get_char_map)

    cm = get_char_map("english")
    char_map = list(ENGLISH_CHAR_MAP)
    words = ["hello", "world", "it'll", "that", "the", "good", "ebb",
             "aa", "ss", "miss", "dog's", "i'm", "off", "e", "tt"]
    rng = random.Random(7)
    checked_equal = 0
    for _ in range(300):
        sentence = " ".join(rng.choice(words)
                            for _ in range(rng.randint(1, 6)))
        cleaned = ref.DataProcessor.clean_label(sentence)
        assert clean_label(sentence) == cleaned
        ref_ids = ref.DataProcessor.get_str_labels(char_map, cleaned)
        ref_text = ref.DataProcessor.get_labels_str(char_map, ref_ids)
        ours_ids = cm.encode(cleaned, add_eos=True)
        if ref_text == cleaned:
            # Reference is lossless here: require identical integer labels.
            assert ours_ids == ref_ids, (cleaned, ours_ids, ref_ids)
            checked_equal += 1
        # Our roundtrip must always reproduce the cleaned input.
        assert cm.decode(cm.encode(cleaned)) == cleaned
    assert checked_equal > 50  # the lossless case must actually be exercised


def test_decode_continuation_is_split_invariant():
    """decode(a) + decode(b, continuation=bool(a-part)) == decode(a+b) at
    every split point — the contract streaming transcription relies on to
    emit text piecewise without losing word boundaries."""
    from rnn_speech_tpu.charmap import CharMap

    cm = CharMap()
    ids = cm.encode("the quick brown fox", add_eos=False)
    whole = cm.decode(ids)
    for split in range(len(ids) + 1):
        head = cm.decode(ids[:split])
        tail = cm.decode(ids[split:], continuation=bool(head))
        assert head + tail == whole, split
