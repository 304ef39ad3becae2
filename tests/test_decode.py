"""Decoder tests: greedy collapse, beam search vs host oracle, edit distance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_speech_tpu.ops import decode, editdistance


# ------------------------------------------------------------------- greedy

def test_greedy_collapse_and_blank_strip():
    # V=4, blank=3. Path: [0, 0, 3, 0, 1, 1, 3, 3, 2] -> 0, 0, 1, 2
    V = 4
    path = [0, 0, 3, 0, 1, 1, 3, 3, 2]
    T = len(path)
    logits = np.full((T, 1, V), -10.0, np.float32)
    for t, p in enumerate(path):
        logits[t, 0, p] = 10.0
    labels, lengths = decode.greedy_decode(
        jnp.asarray(logits), jnp.asarray([T], dtype=jnp.int32)
    )
    assert int(lengths[0]) == 4
    np.testing.assert_array_equal(np.asarray(labels)[0, :4], [0, 0, 1, 2])
    assert np.all(np.asarray(labels)[0, 4:] == -1)


def test_greedy_respects_lengths():
    V = 4
    path = [0, 3, 1, 2, 2]
    logits = np.full((5, 2, V), -10.0, np.float32)
    for t, p in enumerate(path):
        logits[t, 0, p] = 10.0
        logits[t, 1, p] = 10.0
    labels, lengths = decode.greedy_decode(
        jnp.asarray(logits), jnp.asarray([5, 2], dtype=jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(labels)[0, :3], [0, 1, 2])
    assert int(lengths[1]) == 1                 # only [0] within length 2
    np.testing.assert_array_equal(np.asarray(labels)[1, :1], [0])


def test_greedy_jit_batch():
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 1, (20, 3, 6)).astype(np.float32)
    f = jax.jit(decode.greedy_decode)
    labels, lengths = f(jnp.asarray(logits), jnp.asarray([20, 11, 0], dtype=jnp.int32))
    assert labels.shape == (3, 20)
    assert int(lengths[2]) == 0
    assert np.all(np.asarray(labels)[2] == -1)


# -------------------------------------------------------------- beam search

def host_prefix_beam_search(log_probs, beam_width, blank):
    """Dict-based reference prefix beam search (host oracle)."""
    T, V = log_probs.shape
    beams = {(): (0.0, -np.inf)}  # prefix -> (log p_b, log p_nb)
    for t in range(T):
        new = {}

        def add(prefix, pb, pnb):
            opb, opnb = new.get(prefix, (-np.inf, -np.inf))
            new[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            # blank
            add(prefix, total + log_probs[t, blank], -np.inf)
            # repeat last (extends p_nb of same prefix)
            if prefix:
                add(prefix, -np.inf, pnb + log_probs[t, prefix[-1]])
            for c in range(V):
                if c == blank:
                    continue
                p_base = pb if (prefix and c == prefix[-1]) else total
                add(prefix + (c,), -np.inf, p_base + log_probs[t, c])
        beams = dict(
            sorted(new.items(), key=lambda kv: -np.logaddexp(*kv[1]))[:beam_width]
        )
    return [
        (list(k), np.logaddexp(*v))
        for k, v in sorted(beams.items(), key=lambda kv: -np.logaddexp(*kv[1]))
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    T, V, K = 12, 5, 8
    logits = rng.normal(0, 2.0, (T, 1, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[:, 0]), axis=-1))

    expected = host_prefix_beam_search(lp, K, blank=V - 1)

    labels, lengths, scores = decode.beam_search_decode(
        jnp.asarray(logits), jnp.asarray([T], dtype=jnp.int32), beam_width=K
    )
    got_best = list(np.asarray(labels)[0, 0, : int(lengths[0, 0])])
    assert got_best == expected[0][0]
    np.testing.assert_allclose(float(scores[0, 0]), expected[0][1], rtol=1e-4)
    # Top few scores should agree too (identical beams tracked).
    for i in range(3):
        np.testing.assert_allclose(float(scores[0, i]), expected[i][1], rtol=1e-4)


def test_beam_matches_greedy_on_peaked_logits():
    """With near-one-hot logits the beam's best path is the greedy path."""
    rng = np.random.default_rng(3)
    T, B, V = 30, 2, 7
    logits = rng.normal(0, 0.1, (T, B, V)).astype(np.float32)
    path = rng.integers(0, V, (T, B))
    for t in range(T):
        for b in range(B):
            logits[t, b, path[t, b]] = 12.0
    lengths = jnp.asarray([30, 17], dtype=jnp.int32)
    g_labels, g_lens = decode.greedy_decode(jnp.asarray(logits), lengths)
    b_labels, b_lens, _ = decode.beam_search_decode(
        jnp.asarray(logits), lengths, beam_width=4
    )
    for b in range(B):
        assert int(g_lens[b]) == int(b_lens[b, 0])
        np.testing.assert_array_equal(
            np.asarray(g_labels)[b, : int(g_lens[b])],
            np.asarray(b_labels)[b, 0, : int(b_lens[b, 0])],
        )


def test_beam_zero_length_entry():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(0, 1, (10, 2, 5)).astype(np.float32))
    labels, lengths, scores = decode.beam_search_decode(
        logits, jnp.asarray([10, 0], dtype=jnp.int32), beam_width=4
    )
    assert int(lengths[1, 0]) == 0
    assert np.all(np.asarray(labels)[1, 0] == -1)


# ------------------------------------------------------------ edit distance

def host_levenshtein(a, b):
    d = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
    d[:, 0] = np.arange(len(a) + 1)
    d[0, :] = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[len(a), len(b)]


def test_edit_distance_random():
    rng = np.random.default_rng(5)
    B, N, M = 6, 12, 15
    a = rng.integers(0, 4, (B, N)).astype(np.int32)
    b = rng.integers(0, 4, (B, M)).astype(np.int32)
    a_len = rng.integers(0, N + 1, B).astype(np.int32)
    b_len = rng.integers(0, M + 1, B).astype(np.int32)
    got = np.asarray(editdistance.edit_distance(
        jnp.asarray(a), jnp.asarray(a_len), jnp.asarray(b), jnp.asarray(b_len)
    ))
    for i in range(B):
        expected = host_levenshtein(list(a[i, : a_len[i]]), list(b[i, : b_len[i]]))
        assert got[i] == expected, (i, got[i], expected)


def test_error_rate_normalization():
    a = jnp.asarray([[1, 2, 3], [1, 1, 1]], dtype=jnp.int32)
    b = jnp.asarray([[1, 2, 0], [2, 2, 2]], dtype=jnp.int32)
    lens = jnp.asarray([3, 3], dtype=jnp.int32)
    rate = float(editdistance.error_rate(a, lens, b, lens))
    np.testing.assert_allclose(rate, (1 / 3 + 3 / 3) / 2, rtol=1e-6)


@pytest.mark.parametrize("seed,V,K,blank", [
    (3, 5, 8, 4), (4, 5, 4, 0), (5, 7, 3, 6), (6, 4, 6, 3), (7, 6, 2, 5),
])
def test_beam_oracle_fuzz(seed, V, K, blank):
    """Broader beam-vs-oracle sweep: varied vocab/beam sizes and blank ids."""
    rng = np.random.default_rng(seed)
    T = int(rng.integers(6, 14))
    logits = rng.normal(0, 1.8, (T, 1, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[:, 0]), axis=-1))

    expected = host_prefix_beam_search(lp, K, blank=blank)
    labels, lengths, scores = decode.beam_search_decode(
        jnp.asarray(logits), jnp.asarray([T], dtype=jnp.int32),
        beam_width=K, blank_id=blank,
    )
    got_best = list(np.asarray(labels)[0, 0, : int(lengths[0, 0])])
    assert got_best == expected[0][0]
    for i in range(min(K, len(expected), 3)):
        np.testing.assert_allclose(float(scores[0, i]), expected[i][1],
                                   rtol=1e-4)

def test_left_compact_wider_than_T():
    """max_output wider than T keeps the documented output width.

    (Pure-decode coverage: previously lived under test_native_loader's
    module-level native-runtime skipif, vanishing on non-native hosts.)"""
    import jax.numpy as jnp

    from rnn_speech_tpu.ops import decode

    T, B, V = 6, 2, 4
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 2, (T, B, V)).astype(np.float32))
    ll = jnp.asarray([6, 3])
    out, lens = decode.greedy_decode(logits, ll, max_output=10)
    assert out.shape == (B, 10)
    labels, lengths, _ = decode.beam_search_decode(logits, ll, beam_width=3,
                                                   max_output=10)
    assert labels.shape == (B, 3, 10)


def test_top_k_indices_iter_matches_lax(monkeypatch):
    """The iterative masked-argmax top-k must reproduce lax.top_k's exact
    index order, including ties (lowest index first) and -inf rows."""
    from rnn_speech_tpu.ops.decode import _top_k_indices

    rng = np.random.default_rng(11)
    vals = rng.normal(0, 3, (7, 130)).astype(np.float32)
    vals[0, 5] = vals[0, 77] = vals[0, 12]          # three-way tie
    vals[1, :] = -1e30                              # all-dead row
    vals[2, ::3] = 4.25                             # many equal maxima
    rank = jnp.asarray(vals)
    for k in (1, 4, 16):
        monkeypatch.setenv("RST_BEAM_TOPK", "lax")
        ref = np.asarray(_top_k_indices(rank, k))
        monkeypatch.setenv("RST_BEAM_TOPK", "iter")
        got = np.asarray(_top_k_indices(rank, k))
        np.testing.assert_array_equal(got, ref)


def test_beam_search_iter_topk_matches_lax(monkeypatch):
    """Full beam search under RST_BEAM_TOPK=iter is bit-identical to the
    lax.top_k build (same labels, lengths, scores)."""
    rng = np.random.default_rng(4)
    T, B, V, K = 30, 2, 6, 8
    logits = jnp.asarray(rng.normal(0, 1.5, (T, B, V)).astype(np.float32))
    lengths = jnp.asarray([T, T - 7], jnp.int32)

    monkeypatch.setenv("RST_BEAM_TOPK", "lax")
    out_l, len_l, sc_l = decode.beam_search_decode(logits, lengths,
                                                   beam_width=K)
    monkeypatch.setenv("RST_BEAM_TOPK", "iter")
    out_i, len_i, sc_i = decode.beam_search_decode(logits, lengths,
                                                   beam_width=K)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(out_i))
    np.testing.assert_array_equal(np.asarray(len_l), np.asarray(len_i))
    np.testing.assert_allclose(np.asarray(sc_l), np.asarray(sc_i))


# ------------------------------------------------------- streaming decoders

def _run_beam_stream(logits, lengths, chunk, K, lm=None, lm_weight=0.0):
    """Feed logits chunk-by-chunk; return concat(committed) + flush tail."""
    T, B, V = logits.shape
    stream = decode.beam_stream_init(B, V, beam_width=K, max_suffix=64,
                                     lm=lm)
    got = [[] for _ in range(B)]
    off = 0
    while off < T:
        n = min(chunk, T - off)
        cl = jnp.clip(lengths - off, 0, n)
        stream, com, comlen = decode.beam_stream_decode(
            stream, logits[off : off + n], cl, lm=lm, lm_weight=lm_weight
        )
        for b in range(B):
            got[b].extend(int(x) for x in np.asarray(com)[b, : int(comlen[b])])
        off += n
    tail, tail_len = decode.beam_stream_flush(stream)
    for b in range(B):
        got[b].extend(int(x) for x in np.asarray(tail)[b, : int(tail_len[b])])
    return got


@pytest.mark.parametrize("chunk", [1, 5, 7, 37, 50])
def test_greedy_stream_matches_whole_clip(chunk):
    """Chunked greedy with the prev-argmax carry reproduces whole-clip
    greedy text exactly at every chunk size (a character spanning a chunk
    boundary must not be emitted twice)."""
    rng = np.random.default_rng(3)
    T, B, V = 37, 3, 6
    logits = jnp.asarray(rng.normal(0, 2, (T, B, V)).astype(np.float32))
    lengths = jnp.asarray([37, 20, 1], jnp.int32)

    ids, lens = decode.greedy_decode(logits, lengths)
    whole = [
        [int(x) for x in np.asarray(ids)[b, : int(lens[b])]] for b in range(B)
    ]

    prev = jnp.full((B,), -1, jnp.int32)
    got = [[] for _ in range(B)]
    off = 0
    while off < T:
        n = min(chunk, T - off)
        cl = jnp.clip(lengths - off, 0, n)
        out, olens, prev = decode.greedy_stream_decode(
            logits[off : off + n], cl, prev
        )
        for b in range(B):
            got[b].extend(int(x) for x in np.asarray(out)[b, : int(olens[b])])
        off += n
    assert got == whole


@pytest.mark.parametrize("chunk", [1, 6, 11, 37])
def test_beam_stream_matches_whole_clip(chunk):
    """Chunk-carried beam search: concat(committed per chunk) + flush tail
    equals the whole-clip top-1 exactly, at every chunk size — including
    ragged rows whose valid frames end mid-chunk."""
    rng = np.random.default_rng(0)
    T, B, V, K = 37, 3, 8, 4
    logits = jnp.asarray(rng.normal(0, 2, (T, B, V)).astype(np.float32))
    lengths = jnp.asarray([37, 20, 1], jnp.int32)

    out, lens, _ = decode.beam_search_decode(logits, lengths, beam_width=K)
    whole = [
        [int(x) for x in np.asarray(out)[b, 0, : int(lens[b, 0])]]
        for b in range(B)
    ]
    assert _run_beam_stream(logits, lengths, chunk, K) == whole


@pytest.mark.parametrize("chunk", [4, 25])
def test_beam_stream_with_lm_fusion_matches_whole_clip(chunk):
    """The LM-fusion state (cumulative score, per-beam logp, RNN state)
    carries across chunks: chunked shallow-fusion decode equals the
    whole-clip fused top-1 exactly."""
    from rnn_speech_tpu.models import language

    rng = np.random.default_rng(1)
    T, B, V, K = 25, 2, 8, 4
    cfg = language.LanguageConfig(num_layers=1, hidden_size=16, num_labels=V)
    lm_params = language.init_params(jax.random.PRNGKey(3), cfg)
    lm = language.stepper(lm_params, cfg)

    logits = jnp.asarray(rng.normal(0, 2, (T, B, V)).astype(np.float32))
    lengths = jnp.asarray([25, 13], jnp.int32)

    out, lens, _ = decode.beam_search_decode(
        logits, lengths, beam_width=K, lm=lm, lm_weight=0.7
    )
    whole = [
        [int(x) for x in np.asarray(out)[b, 0, : int(lens[b, 0])]]
        for b in range(B)
    ]
    got = _run_beam_stream(logits, lengths, chunk, K, lm=lm, lm_weight=0.7)
    assert got == whole


def test_beam_stream_forced_commit_on_suffix_saturation():
    """When beam disagreement outlives ``max_suffix`` the stream must
    force-commit the best beam's overflow instead of silently dropping
    symbols.  Fixture: a near-tie at frame 0 keeps two beams alive that
    disagree on symbol 0 forever (so the all-beams-agree commit never
    fires), while confident alternating emissions grow every suffix —
    without the forced commit, every symbol past ``max_suffix`` was lost
    from both the committed stream and the flush tail."""
    T, B, V, K = 40, 1, 5, 4
    base = np.full((T, B, V), -8.0, np.float32)
    base[0, 0, 0] = 2.01
    base[0, 0, 1] = 1.99
    for t in range(1, T):
        base[t, 0, 2 + (t % 2)] = 4.0
    logits = jnp.asarray(base)
    lengths = jnp.asarray([T], jnp.int32)

    out, lens, _ = decode.beam_search_decode(logits, lengths, beam_width=K)
    whole = [int(x) for x in np.asarray(out)[0, 0, : int(lens[0, 0])]]
    assert len(whole) == T  # every frame emits: the fixture saturates U=8

    U = 8
    stream = decode.beam_stream_init(B, V, beam_width=K, max_suffix=U)
    got, maxbuf, off = [], 0, 0
    while off < T:
        n = min(6, T - off)
        stream, com, comlen = decode.beam_stream_decode(
            stream, logits[off : off + n], jnp.asarray([n], jnp.int32)
        )
        maxbuf = max(maxbuf, int(jnp.max(stream.prefix_len)))
        got.extend(int(x) for x in np.asarray(com)[0, : int(comlen[0])])
        off += n
    tail, tail_len = decode.beam_stream_flush(stream)
    got.extend(int(x) for x in np.asarray(tail)[0, : int(tail_len[0])])

    assert maxbuf == U          # the suffix buffer really did saturate
    assert got == whole         # ... and nothing was dropped or reordered


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_stream_length_conservation_fuzz(seed):
    """For ANY suffix capacity and ANY chunk-size sequence, the total
    streamed symbol count must equal the whole-clip top-1 length: the
    beam scan (and hence per-lineage emission count) is independent of
    the buffer, so symbols may at worst be force-committed early — never
    duplicated or dropped."""
    rng = np.random.default_rng(seed)
    T, B, V, K = 41, 2, 6, 4
    logits = jnp.asarray(rng.normal(0, 1.0, (T, B, V)).astype(np.float32))
    lengths = jnp.asarray([T, T - 11], jnp.int32)

    out, lens, _ = decode.beam_search_decode(logits, lengths, beam_width=K)
    whole_lens = [int(lens[b, 0]) for b in range(B)]

    chunks = []
    left = T
    while left:
        n = int(rng.integers(1, 9))
        n = min(n, left)
        chunks.append(n)
        left -= n
    for U in (48, 8):
        stream = decode.beam_stream_init(B, V, beam_width=K, max_suffix=U)
        totals = [0] * B
        off = 0
        for n in chunks:
            cl = jnp.clip(lengths - off, 0, n)
            stream, com, comlen = decode.beam_stream_decode(
                stream, logits[off : off + n], cl
            )
            for b in range(B):
                totals[b] += int(comlen[b])
            off += n
        _, tail_len = decode.beam_stream_flush(stream)
        for b in range(B):
            totals[b] += int(tail_len[b])
        assert totals == whole_lens, (U, chunks)


def test_beam_stream_commits_are_monotone_prefixes():
    """Committed symbols are final: the concatenation after every chunk is
    a prefix of the concatenation after the next chunk."""
    rng = np.random.default_rng(7)
    T, B, V, K = 30, 1, 6, 4
    logits = jnp.asarray(rng.normal(0, 1.5, (T, B, V)).astype(np.float32))
    lengths = jnp.asarray([T], jnp.int32)

    stream = decode.beam_stream_init(B, V, beam_width=K, max_suffix=64)
    emitted = []
    snapshots = []
    for off in range(0, T, 5):
        stream, com, comlen = decode.beam_stream_decode(
            stream, logits[off : off + 5], jnp.asarray([5], jnp.int32)
        )
        emitted.extend(int(x) for x in np.asarray(com)[0, : int(comlen[0])])
        snapshots.append(list(emitted))
    for a, b in zip(snapshots, snapshots[1:]):
        assert b[: len(a)] == a
