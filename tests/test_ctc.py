"""CTC loss tests: brute-force oracle, torch parity, gradient checks."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_speech_tpu.ops import ctc


def brute_force_ctc(log_probs, label, blank):
    """-log sum of path probabilities over all alignments (tiny cases)."""
    T, V = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        # Collapse: merge repeats then drop blanks.
        collapsed = []
        prev = None
        for p in path:
            if p != prev:
                if p != blank:
                    collapsed.append(p)
            prev = p
        if collapsed == list(label):
            lp = sum(log_probs[t, p] for t, p in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


@pytest.fixture(scope="module")
def small_case():
    rng = np.random.default_rng(0)
    T, B, V = 5, 3, 4
    logits = rng.normal(0, 2.0, (T, B, V)).astype(np.float32)
    labels = np.array([[1, 2, -1], [0, 0, 1], [2, -1, -1]], dtype=np.int32)
    label_lengths = np.array([2, 3, 1], dtype=np.int32)
    logit_lengths = np.array([5, 5, 4], dtype=np.int32)
    return logits, logit_lengths, labels, label_lengths, V


def test_matches_brute_force(small_case):
    logits, logit_lengths, labels, label_lengths, V = small_case
    blank = V - 1
    loss = np.asarray(
        ctc.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lengths),
                     jnp.asarray(labels), jnp.asarray(label_lengths))
    )
    for b in range(3):
        lp = jax.nn.log_softmax(jnp.asarray(logits[: logit_lengths[b], b]), axis=-1)
        expected = brute_force_ctc(
            np.asarray(lp), labels[b, : label_lengths[b]], blank
        )
        np.testing.assert_allclose(loss[b], expected, rtol=1e-5)


def test_matches_torch(small_case):
    torch = pytest.importorskip("torch")
    logits, logit_lengths, labels, label_lengths, V = small_case
    blank = V - 1

    loss = np.asarray(
        ctc.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lengths),
                     jnp.asarray(labels), jnp.asarray(label_lengths))
    )

    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.nn.functional.log_softmax(t_logits, dim=-1)
    t_labels = torch.tensor(np.where(labels < 0, 0, labels))
    t_loss = torch.nn.functional.ctc_loss(
        t_lp, t_labels,
        torch.tensor(logit_lengths), torch.tensor(label_lengths),
        blank=blank, reduction="none",
    )
    np.testing.assert_allclose(loss, t_loss.detach().numpy(), rtol=1e-4)

    # Gradient parity (sum of per-example losses).
    t_loss.sum().backward()
    grad = jax.grad(
        lambda lg: jnp.sum(
            ctc.ctc_loss(lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
                         jnp.asarray(label_lengths))
        )
    )(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(grad), t_logits.grad.numpy(), atol=1e-4
    )


def test_torch_parity_large_random():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    T, B, V, L = 60, 4, 30, 20
    logits = rng.normal(0, 1.5, (T, B, V)).astype(np.float32)
    label_lengths = np.array([20, 13, 1, 7], dtype=np.int32)
    logit_lengths = np.array([60, 45, 60, 30], dtype=np.int32)
    labels = np.full((B, L), -1, dtype=np.int32)
    for b in range(B):
        # Blank is V-1: labels drawn from real classes only.
        labels[b, : label_lengths[b]] = rng.integers(0, V - 1, label_lengths[b])

    loss = np.asarray(
        ctc.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lengths),
                     jnp.asarray(labels), jnp.asarray(label_lengths))
    )
    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.nn.functional.log_softmax(t_logits, dim=-1)
    t_loss = torch.nn.functional.ctc_loss(
        t_lp, torch.tensor(np.where(labels < 0, 0, labels)),
        torch.tensor(logit_lengths), torch.tensor(label_lengths),
        blank=V - 1, reduction="none",
    )
    np.testing.assert_allclose(loss, t_loss.detach().numpy(), rtol=1e-4)

    t_loss.sum().backward()
    grad = jax.grad(
        lambda lg: jnp.sum(
            ctc.ctc_loss(lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
                         jnp.asarray(label_lengths))
        )
    )(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(grad), t_logits.grad.numpy(), atol=1e-4)


def test_finite_difference_gradient(small_case):
    logits, logit_lengths, labels, label_lengths, V = small_case

    def f(lg):
        return jnp.sum(
            ctc.ctc_loss(lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
                         jnp.asarray(label_lengths))
        )

    grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    eps = 1e-3
    rng = np.random.default_rng(1)
    for _ in range(10):
        t = rng.integers(0, logits.shape[0])
        b = rng.integers(0, logits.shape[1])
        v = rng.integers(0, V)
        bump = np.zeros_like(logits)
        bump[t, b, v] = eps
        fd = (float(f(jnp.asarray(logits + bump)))
              - float(f(jnp.asarray(logits - bump)))) / (2 * eps)
        np.testing.assert_allclose(grad[t, b, v], fd, atol=2e-3)


def test_ignore_longer_outputs_than_inputs():
    rng = np.random.default_rng(2)
    T, B, V = 4, 2, 5
    logits = jnp.asarray(rng.normal(0, 1, (T, B, V)).astype(np.float32))
    labels = jnp.asarray([[0, 1, 2, 3, 0, 1], [0, 1, -1, -1, -1, -1]], dtype=jnp.int32)
    label_lengths = jnp.asarray([6, 2], dtype=jnp.int32)   # 6 > T=4 -> ignored
    logit_lengths = jnp.asarray([4, 4], dtype=jnp.int32)

    loss = ctc.ctc_loss(logits, logit_lengths, labels, label_lengths)
    assert float(loss[0]) == 0.0
    assert float(loss[1]) > 0.0

    grad = jax.grad(lambda lg: jnp.sum(
        ctc.ctc_loss(lg, logit_lengths, labels, label_lengths)
    ))(logits)
    assert np.all(np.asarray(grad)[:, 0, :] == 0.0)
    assert np.abs(np.asarray(grad)[:, 1, :]).max() > 0.0


def test_loss_is_jittable(small_case):
    logits, logit_lengths, labels, label_lengths, V = small_case
    f = jax.jit(ctc.ctc_loss)
    loss = f(jnp.asarray(logits), jnp.asarray(logit_lengths),
             jnp.asarray(labels), jnp.asarray(label_lengths))
    loss2 = ctc.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lengths),
                         jnp.asarray(labels), jnp.asarray(label_lengths))
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss2), rtol=1e-6)


def test_mean_loss_normalizes_by_input_length(small_case):
    logits, logit_lengths, labels, label_lengths, V = small_case
    per = np.asarray(ctc.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths)))
    mean = float(ctc.ctc_loss_mean(
        jnp.asarray(logits), jnp.asarray(logit_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths)))
    np.testing.assert_allclose(mean, (per / logit_lengths).mean(), rtol=1e-6)


# ------------------------------------------------------ Pallas kernel parity

def _pallas_ctc():
    from rnn_speech_tpu.ops import ctc_pallas
    return ctc_pallas


def test_pallas_loss_matches_scan(small_case):
    """Pallas alpha kernel (interpret mode) == scan CTC, incl. ragged rows."""
    from jax.experimental.pallas import tpu as pltpu
    ctc_pallas = _pallas_ctc()

    logits, logit_lengths, labels, label_lengths, V = small_case
    args = (jnp.asarray(logits), jnp.asarray(logit_lengths),
            jnp.asarray(labels), jnp.asarray(label_lengths))
    ref = ctc.ctc_loss(*args)
    with pltpu.force_tpu_interpret_mode():
        pal = ctc_pallas.ctc_loss(*args)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_grad_matches_scan():
    """Pallas beta/posterior kernel == scan backward on a random batch with
    ragged input lengths and an invalid (label > input) example."""
    from jax.experimental.pallas import tpu as pltpu
    ctc_pallas = _pallas_ctc()

    rng = np.random.default_rng(3)
    T, B, V, L = 12, 4, 6, 5
    logits = jnp.asarray(rng.normal(0, 1.5, (T, B, V)).astype(np.float32))
    logit_lengths = jnp.asarray(np.array([12, 7, 3, 12], np.int32))
    labels = jnp.asarray(rng.integers(0, V - 1, (B, L)).astype(np.int32))
    label_lengths = jnp.asarray(np.array([5, 3, 4, 0], np.int32))  # row 2 invalid

    def total(fn, lg):
        return jnp.sum(fn(lg, logit_lengths, labels, label_lengths)
                       * jnp.array([1.0, 2.0, 3.0, 4.0]))

    ref_loss = ctc.ctc_loss(logits, logit_lengths, labels, label_lengths)
    ref_grad = jax.grad(lambda lg: total(ctc.ctc_loss, lg))(logits)
    with pltpu.force_tpu_interpret_mode():
        pal_loss = ctc_pallas.ctc_loss(logits, logit_lengths, labels,
                                       label_lengths)
        pal_grad = jax.grad(lambda lg: total(ctc_pallas.ctc_loss, lg))(logits)

    np.testing.assert_allclose(np.asarray(pal_loss), np.asarray(ref_loss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-5)
    # Invalid example (labels longer than inputs): zero loss, zero grad.
    assert float(pal_loss[2]) == 0.0
    assert np.all(np.asarray(pal_grad)[:, 2, :] == 0.0)


def test_bf16_posterior_stream_grad_close():
    """post_dtype=bf16 (the training default for bf16-computing models)
    narrows only the backward's exp-space posterior stream: the gradient
    stays within bf16 rounding (~2^-9 relative on values in [0, 1]) of the
    f32-stream gradient, and the loss value is bit-identical (forward
    doesn't touch the posterior path)."""
    from jax.experimental.pallas import tpu as pltpu
    ctc_pallas = _pallas_ctc()

    rng = np.random.default_rng(11)
    T, B, V, L = 14, 3, 7, 5
    logits = jnp.asarray(rng.normal(0, 1.5, (T, B, V)).astype(np.float32))
    ll = jnp.asarray([14, 9, 14], jnp.int32)
    labels = jnp.asarray(rng.integers(0, V - 1, (B, L)).astype(np.int32))
    lab_len = jnp.asarray([5, 3, 4], jnp.int32)

    def total(lg, post_dtype):
        return jnp.sum(ctc_pallas.ctc_loss(lg, ll, labels, lab_len,
                                           -1, post_dtype))

    with pltpu.force_tpu_interpret_mode():
        loss32 = ctc_pallas.ctc_loss(logits, ll, labels, lab_len,
                                     -1, jnp.float32)
        loss16 = ctc_pallas.ctc_loss(logits, ll, labels, lab_len,
                                     -1, jnp.bfloat16)
        g32 = jax.grad(total)(logits, jnp.float32)
        g16 = jax.grad(total)(logits, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(loss32), np.asarray(loss16))
    assert g16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=4e-3)
    # And it still agrees with the scan reference at the same tolerance.
    g_ref = jax.grad(lambda lg: jnp.sum(
        ctc.ctc_loss(lg, ll, labels, lab_len)))(logits)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g_ref),
                               atol=4e-3)


def test_all_empty_labels():
    """A batch where every transcript is empty (S=1) is well-defined:
    loss = -sum of blank log-probs over each row's frames."""
    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops import ctc_pallas

    T, B, V = 7, 2, 5
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1.5, (T, B, V)).astype(np.float32))
    labels = jnp.zeros((B, 0), jnp.int32)
    lab_len = jnp.zeros((B,), jnp.int32)
    ll = jnp.asarray([7, 4], jnp.int32)

    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    expect = [-lp[:7, 0, V - 1].sum(), -lp[:4, 1, V - 1].sum()]

    loss = ctc.ctc_loss(logits, ll, labels, lab_len)
    np.testing.assert_allclose(np.asarray(loss), expect, rtol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        loss_p = ctc_pallas.ctc_loss(logits, ll, labels, lab_len)
        grad_p = jax.grad(lambda lg: jnp.sum(
            ctc_pallas.ctc_loss(lg, ll, labels, lab_len)))(logits)
    np.testing.assert_allclose(np.asarray(loss_p), expect, rtol=1e-5)
    grad_s = jax.grad(lambda lg: jnp.sum(
        ctc.ctc_loss(lg, ll, labels, lab_len)))(logits)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_s),
                               atol=1e-5)


def test_pallas_loss_only_matches_grad_path(small_case):
    """The loss-only kernel (primal, no residual stream) == the fwd-for-grad
    value."""
    from jax.experimental.pallas import tpu as pltpu

    from rnn_speech_tpu.ops import ctc_pallas

    logits, logit_lengths, labels, label_lengths, V = small_case
    args = (jnp.asarray(logits), jnp.asarray(logit_lengths),
            jnp.asarray(labels), jnp.asarray(label_lengths))
    with pltpu.force_tpu_interpret_mode():
        primal = ctc_pallas.ctc_loss(*args)
        value, _ = jax.value_and_grad(
            lambda lg: jnp.sum(ctc_pallas.ctc_loss(lg, *args[1:]))
        )(args[0])
    np.testing.assert_allclose(float(jnp.sum(primal)), float(value), rtol=1e-6)


def test_pallas_blocked_time_edges(monkeypatch):
    """K-blocked kernels at exact block-boundary lengths: T a multiple of
    the time block (no padding) and row lengths landing exactly on and
    around block boundaries; loss+grad vs the scan reference.  K is pinned
    via the triage knob: the VMEM-budgeted auto-K exceeds this tiny T, so
    the no-padding path would otherwise never be exercised here."""
    from jax.experimental.pallas import tpu as pltpu
    ctc_pallas = _pallas_ctc()
    from rnn_speech_tpu.ops.ctc_pallas import _time_block

    monkeypatch.setenv("RST_CTC_KBLOCK", "8")
    rng = np.random.default_rng(11)
    T, B, V, L = 32, 4, 6, 5
    K = _time_block(B, 2 * L + 1)
    assert T % K == 0, (T, K)     # the no-padding path must be exercised
    logits = jnp.asarray(rng.normal(0, 1.5, (T, B, V)).astype(np.float32))
    logit_lengths = jnp.asarray(np.array([32, 16, 17, 31], np.int32))
    labels = jnp.asarray(rng.integers(0, V - 1, (B, L)).astype(np.int32))
    label_lengths = jnp.asarray(np.array([5, 4, 3, 2], np.int32))

    w = jnp.array([1.0, 2.0, 3.0, 4.0])

    def total(fn, lg):
        return jnp.sum(fn(lg, logit_lengths, labels, label_lengths) * w)

    ref_loss = ctc.ctc_loss(logits, logit_lengths, labels, label_lengths)
    ref_grad = jax.grad(lambda lg: total(ctc.ctc_loss, lg))(logits)
    with pltpu.force_tpu_interpret_mode():
        pal_loss = ctc_pallas.ctc_loss(logits, logit_lengths, labels,
                                       label_lengths)
        pal_grad = jax.grad(lambda lg: total(ctc_pallas.ctc_loss, lg))(logits)
    np.testing.assert_allclose(np.asarray(pal_loss), np.asarray(ref_loss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-5)


def test_chunked_backward_matches_reference(monkeypatch):
    """The time-chunked CTC backward (lattice rebuilt and posteriors
    consumed per chunk inside a reverse scan, beta state carried through
    the kernel's bstar in/out) is bit-identical to the scan reference —
    chunk boundaries, the cross-chunk alpha-checkpoint handoff, and the
    t=0 seeding flag must all land exactly."""
    monkeypatch.setenv("RST_CTC_CHUNKED", "force")
    monkeypatch.setenv("RST_CTC_KBLOCK", "8")
    from jax.experimental.pallas import tpu as pltpu

    ctc_pallas = _pallas_ctc()

    rng = np.random.RandomState(7)
    T, B, V, L = 40, 4, 10, 6
    logits = jnp.asarray(rng.randn(T, B, V), jnp.float32)
    ll = jnp.asarray([40, 23, 8, 40], jnp.int32)
    labels = jnp.asarray(rng.randint(0, V - 1, (B, L)), jnp.int32)
    lab_len = jnp.asarray([6, 3, 1, 5], jnp.int32)

    def loss_pal(x):
        return ctc_pallas.ctc_loss(x, ll, labels, lab_len).sum()

    def loss_ref(x):
        return ctc.ctc_loss(x, ll, labels, lab_len).sum()

    with pltpu.force_tpu_interpret_mode():
        vp, gp = jax.value_and_grad(loss_pal)(logits)
    vr, gr = jax.value_and_grad(loss_ref)(logits)
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)
