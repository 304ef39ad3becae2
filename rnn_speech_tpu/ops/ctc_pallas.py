"""Fused Pallas TPU kernels for the CTC loss (alpha/beta recursions).

Same semantics as rnn_speech_tpu.ops.ctc (the lax.scan reference
implementation, itself pinned against torch's CTC): log-space
forward/backward over the extended-label lattice with
``ignore_longer_outputs_than_inputs`` handling, blank = last class.  The
scan path dispatches T tiny (B, S) updates that each round-trip the lattice
state through HBM; here one ``pallas_call`` walks the time grid with the
alpha (resp. beta) row resident in VMEM scratch, streaming the per-step
label log-probs in K-step blocks (``_time_block``): the recursion math is
~0.1 µs of VPU work per step while a (1, B, S)-block pipeline costs ~9 µs
of fixed per-grid-step overhead at reference shapes, so K-blocking buys
back nearly the whole kernel. Callers pad T to a multiple of K with
live=0 steps, which freeze alpha and zero the posteriors exactly.

The posterior scatter (extended states -> vocabulary) and the softmax term
stay outside the kernels as one big batched einsum, which is MXU work XLA
already does well; the kernels own exactly the sequential recursions.

Replaces ``tf.nn.ctc_loss`` (/root/reference/models/AcousticModel.py:357)
on the TPU training path; numerical parity with the scan path is pinned by
tests/test_ctc.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_speech_tpu.ops import pallas_vma

from rnn_speech_tpu.ops.ctc import (
    NEG_INF,
    _log_add3,
    _prepare,
    _terminal_logp,
)


def _shift_right_lanes(x, by):
    B, S = x.shape
    if by >= S:  # all-empty labels: S = 2*0+1 = 1, nothing to shift in
        return jnp.full_like(x, NEG_INF)
    pad = jnp.full((B, by), NEG_INF, x.dtype)
    return jnp.concatenate([pad, x[:, :-by]], axis=1)


def _shift_left_lanes(x, by):
    B, S = x.shape
    if by >= S:
        return jnp.full_like(x, NEG_INF)
    pad = jnp.full((B, by), NEG_INF, x.dtype)
    return jnp.concatenate([x[:, by:], pad], axis=1)


def _time_block(B: int, S: int) -> int:
    """Time steps processed per grid invocation.  The per-grid-step cost of
    these kernels is dominated by fixed pipeline overhead (~9 µs/step when
    streaming single (1, B, S) blocks at reference shapes — the math itself
    is ~0.1 µs of VPU work), so blocking K steps per invocation amortizes
    it ~K-fold.  K is sized so the streamed blocks stay well inside VMEM
    even with double buffering (lp + alphas + post ~ 3 streams).
    In the batch-major (B, K, S) blocks K sits in the SUBLANE dimension,
    so the Pallas TPU lowering requires K % 8 == 0 (or K == T) — both the
    computed and the RST_CTC_KBLOCK-forced values are rounded up to 8.
    RST_CTC_KBLOCK=8 is the minimal-pipelining triage rung."""
    import os

    forced = int(os.environ.get("RST_CTC_KBLOCK", "0"))
    if forced > 0:
        return max(8, -(-forced // 8) * 8)
    # Worst-case VMEM per blocked time step: the posteriors kernel streams
    # three (K, B, S) f32 blocks (lp, alphas, post out), each
    # double-buffered, with S padded to the 128-lane tile.  Budget them
    # against an explicit scoped-VMEM grant (``_vmem_limit``) rather than
    # the compiler's 16 MiB default — at the reference's S=1201 lattice the
    # old 4 MiB budget forced K=4 (878 grid invocations per pass, ~40 ms of
    # almost pure per-invocation overhead).
    s_pad = -(-S // 128) * 128
    per_step = 6 * B * s_pad * 4
    k = max(8, min(64, (56 << 20) // max(per_step, 1)))
    while k & (k - 1):          # round down to a power of two
        k &= k - 1
    return max(8, k)


def _vmem_limit(K: int, B: int, S: int) -> int:
    """Scoped-VMEM request sized to the worst kernel's streamed blocks
    (6 double-buffered (K, B, S)-class streams plus up to two (K, B, S)
    f32 scratches: the ckpt kernel's alpha rebuild and the narrow-output
    staging buffer)."""
    s_pad = -(-S // 128) * 128
    return min((100 << 20), 8 * K * B * s_pad * 4 + (8 << 20))


def _alpha_kernel(K, lp_ref, live_ref, skip_ref, alpha_in_ref, first_ref,
                  alphas_ref, last_ref, a_s):
    """The call may cover a time CHUNK (_ctc_fwd_impl's chunked scan):
    ``alpha_in`` carries the recursion state in from the previous chunk
    and the scalar ``first`` flag selects the t=0 seeding only for the
    chunk that contains t=0.  ``last`` carries the state out."""
    i = pl.program_id(0)
    NI = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        a_s[:] = alpha_in_ref[...]

    for k in range(K):
        lp = lp_ref[:, k].astype(jnp.float32)             # (B, S)

        alpha = a_s[:]
        a1 = _shift_right_lanes(alpha, 1)
        a2 = jnp.where(skip_ref[:] > 0,
                       _shift_right_lanes(alpha, 2), NEG_INF)
        new = _log_add3(alpha, a1, a2) + lp
        live = live_ref[k, 0][:, None]                    # (B, 1) float
        upd = jnp.where(live > 0, new, alpha)             # freeze past T_b
        if k == 0:
            s_idx = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
            seeded = jnp.where(s_idx < 2, lp, NEG_INF)
            upd = jnp.where((i == 0) & (first_ref[0] > 0), seeded, upd)
        a_s[:] = upd

        if alphas_ref is not None:
            alphas_ref[:, k] = a_s[:].astype(alphas_ref.dtype)

    @pl.when(i == NI - 1)
    def _():
        last_ref[:] = a_s[:]


def _alpha_kernel_lossonly(K, lp_ref, live_ref, skip_ref, alpha_in_ref,
                           first_ref, last_ref, a_s):
    """Alpha recursion emitting only the terminal row (no residual stream)."""
    _alpha_kernel(K, lp_ref, live_ref, skip_ref, alpha_in_ref, first_ref,
                  None, last_ref, a_s)


def _alpha_kernel_ckpt(K, lp_ref, live_ref, skip_ref, alpha_in_ref,
                       first_ref, ckpt_ref, last_ref, a_s):
    """Alpha recursion emitting one (B, S) CHECKPOINT per K-step block —
    the state AFTER the block — instead of the full (T, B, S) stream.
    The backward's fused kernel rebuilds each block's alpha rows from its
    predecessor's checkpoint in VMEM (``_beta_post_ckpt_kernel``), so the
    f32 alpha stream (1.6 GB at B=96 flagship shapes) never exists."""
    _alpha_kernel(K, lp_ref, live_ref, skip_ref, alpha_in_ref, first_ref,
                  None, last_ref, a_s)
    ckpt_ref[0] = a_s[:]


def _alphas_pallas(lp_ext, live, skip_ok, emit_alphas=True,
                   stream_dtype=jnp.float32, alpha_in=None, first=None):
    """lp_ext (B, T, S) — batch-major so the one-hot lattice dot lands in
    its NATURAL dot_general output layout (batch, lhs_rest, rhs_rest); the
    time-major form forced XLA to materialize a layout-transposition copy
    of the whole f32 lattice (2×~1.6 GB at B=96 flagship shapes).  live is
    (T, 1, B) float, skip_ok (B, S) float; T must be a multiple of
    ``_time_block(B, S)`` (callers pad with live=0 steps, which the freeze
    rule makes no-ops).  Returns (alphas (B, T, S) / ckpts (T/K, B, S) /
    None, last (B, S)).  ``stream_dtype`` exists for measurement only and
    must stay f32 in production: alphas are LOG-space values whose
    magnitude grows ~linearly in t (|alpha| ~ 1e4 at T=3510), so a 8-bit
    mantissa loses the ABSOLUTE log precision the posterior
    exp(alpha + beta - logP) needs — bf16 here was measured at ~13 %
    relative gradient error already at T=14."""
    B, T, S = lp_ext.shape
    K = _time_block(B, S)
    assert T % K == 0, (T, K)
    if alpha_in is None:
        alpha_in = jnp.full((B, S), NEG_INF, jnp.float32)
    if first is None:
        first = jnp.ones((1,), jnp.int32)
    in_specs = [
        pl.BlockSpec((B, K, S), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = (lp_ext, live, skip_ok, alpha_in, first)
    cost = pl.CostEstimate(
        flops=10 * T * B * S,
        bytes_accessed=2 * T * B * S * 4,
        transcendentals=4 * T * B * S,
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_limit(K, B, S),
    )
    if emit_alphas == "ckpt":
        ckpt, last = pallas_vma.pallas_call(
            functools.partial(_alpha_kernel_ckpt, K),
            grid=(T // K,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, B, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T // K, B, S), jnp.float32),
                jax.ShapeDtypeStruct((B, S), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
            compiler_params=compiler_params,
            cost_estimate=cost,
        )(*args)
        return ckpt, last
    if not emit_alphas:
        (last,) = pallas_vma.pallas_call(
            functools.partial(_alpha_kernel_lossonly, K),
            grid=(T // K,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((B, S), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
            compiler_params=compiler_params,
            cost_estimate=cost,
        )(*args)
        return None, last
    return pallas_vma.pallas_call(
        functools.partial(_alpha_kernel, K),
        grid=(T // K,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, K, S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, S), stream_dtype),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        compiler_params=compiler_params,
        cost_estimate=cost,
    )(*args)


def _beta_post_kernel(K, lp_ref, alphas_ref, islast_ref, live_ref,
                      skipn2_ref, beta_init_ref, logp_ref, post_ref,
                      bstar_s, post_s=None):
    """Reverse-time steps: advance beta, emit the state posterior
    exp(alpha + beta - logP) zeroed past each row's true length.

    The carried state is ``bstar_t = beta_t + lp_t`` rather than beta
    itself: the classic recursion needs lp at t+1, which under K-step
    blocking would straddle block boundaries; folding lp into the carry
    keeps every streamed input on the same reversed block map.  The t=T-1
    base case falls out of seeding bstar with NEG_INF (no continuation
    past the last frame) -- rows whose length is exactly T are reset to
    beta_init by their islast flag like every other row.

    A NARROW output stream (bf16 post_dtype) routes the per-step rows
    through the f32 ``post_s`` scratch and bulk-casts once per grid step:
    Mosaic rejects the single-sublane insert (B, S) -> (B, 1, S) for
    packed 16-bit dtypes (bf16 vregs pack 2 sublanes), while the aligned
    full-block (B, K, S) cast+store is supported."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        bstar_s[:] = jnp.full_like(bstar_s[:], NEG_INF)

    sink = post_ref if post_s is None else post_s
    for k in reversed(range(K)):                          # t descends
        term0 = bstar_s[:]                                # beta_{t+1}+lp_{t+1}
        b1 = _shift_left_lanes(term0, 1)
        b2 = jnp.where(skipn2_ref[:] > 0, _shift_left_lanes(term0, 2),
                       NEG_INF)
        beta = _log_add3(term0, b1, b2)
        islast = islast_ref[k, 0][:, None]                # (B, 1) float
        beta = jnp.where(islast > 0, beta_init_ref[:], beta)
        gamma = (alphas_ref[:, k].astype(jnp.float32) + beta
                 - logp_ref[:, :1])
        live = live_ref[k, 0][:, None]
        post = jnp.exp(jnp.minimum(gamma, 0.0)) * live
        sink[:, k] = post.astype(sink.dtype)
        bstar_s[:] = beta + lp_ref[:, k].astype(jnp.float32)
    if post_s is not None:
        post_ref[...] = post_s[...].astype(post_ref.dtype)


def _beta_post_ckpt_kernel(K, lp_ref, ckpt_ref, ckpt_prev_ref, first_ref,
                           islast_ref, live_ref, skip_ref, skipn2_ref,
                           beta_init_ref, logp_ref, bstar_in_ref,
                           post_ref, bstar_out_ref, bstar_s, alpha_s,
                           post_s=None):
    """Fused reverse pass: rebuild this K-block's alpha rows from the
    previous block's checkpoint (forward in k, pure VMEM), then advance
    beta and emit the posteriors exp(alpha + beta - logP) (reverse in k).
    One kernel replaces the backward's full-stream alpha re-run plus the
    separate beta/post pass — and the (T, B, S) f32 alpha stream never
    touches HBM (at B=96 flagship shapes that stream alone is 1.6 GB).

    The call may cover a time CHUNK rather than the whole sequence
    (_ctc_bwd's chunked scan): ``bstar_in``/``bstar_out`` carry the beta
    recursion state across chunks, ``ckpt_prev`` is the predecessor
    chunk's last alpha checkpoint (feeds the chunk's first block), and
    the scalar ``first`` flag selects the t=0 alpha seeding only for the
    chunk that actually contains t=0.

    The alpha rebuild is bit-identical to ``_alpha_kernel``: same update,
    same freeze rule, same t=0 seeding."""
    j = pl.program_id(0)
    NI = pl.num_programs(0)
    i_first = j == NI - 1          # reverse grid: block i = NI-1-j

    @pl.when(j == 0)
    def _():
        bstar_s[:] = bstar_in_ref[...]

    carry = jnp.where(i_first, ckpt_prev_ref[...],
                      ckpt_ref[0])            # alpha AFTER block i-1
    for k in range(K):
        lp = lp_ref[:, k].astype(jnp.float32)
        a1 = _shift_right_lanes(carry, 1)
        a2 = jnp.where(skip_ref[:] > 0, _shift_right_lanes(carry, 2),
                       NEG_INF)
        new = _log_add3(carry, a1, a2) + lp
        live = live_ref[k, 0][:, None]
        new = jnp.where(live > 0, new, carry)  # freeze past T_b
        if k == 0:
            s_idx = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
            seed = jnp.where(s_idx < 2, lp, NEG_INF)
            new = jnp.where(i_first & (first_ref[0] > 0), seed, new)
        alpha_s[k] = new
        carry = new

    sink = post_ref if post_s is None else post_s
    for k in reversed(range(K)):              # t descends
        term0 = bstar_s[:]                    # beta_{t+1}+lp_{t+1}
        b1 = _shift_left_lanes(term0, 1)
        b2 = jnp.where(skipn2_ref[:] > 0, _shift_left_lanes(term0, 2),
                       NEG_INF)
        beta = _log_add3(term0, b1, b2)
        islast = islast_ref[k, 0][:, None]    # (B, 1) float
        beta = jnp.where(islast > 0, beta_init_ref[:], beta)
        gamma = alpha_s[k] + beta - logp_ref[:, :1]
        live = live_ref[k, 0][:, None]
        post = jnp.exp(jnp.minimum(gamma, 0.0)) * live
        sink[:, k] = post.astype(sink.dtype)
        bstar_s[:] = beta + lp_ref[:, k].astype(jnp.float32)
    if post_s is not None:
        # Aligned full-block cast to the narrow output stream (see
        # _beta_post_kernel).
        post_ref[...] = post_s[...].astype(post_ref.dtype)

    @pl.when(j == NI - 1)
    def _():
        bstar_out_ref[...] = bstar_s[:]


def _posteriors_from_ckpt_pallas(lp_ext, ckpts, islast, live, skip_ok,
                                 skipn2, beta_init, logp,
                                 post_dtype=jnp.float32,
                                 ckpt_prev=None, first=None,
                                 bstar_in=None):
    """Posteriors (B, T, S) from per-block alpha CHECKPOINTS (NI, B, S)
    instead of the full alpha stream — see ``_beta_post_ckpt_kernel``.

    With ``ckpt_prev``/``first``/``bstar_in`` the call covers one time
    CHUNK of a longer sequence and also returns the outgoing beta-carry
    ``bstar`` (B, S); without them it spans the whole (padded) sequence.
    Returns (post, bstar_out)."""
    B, T, S = lp_ext.shape
    K = _time_block(B, S)
    assert T % K == 0, (T, K)
    NI = T // K
    assert ckpts.shape[0] == NI, (ckpts.shape, NI)
    if ckpt_prev is None:
        ckpt_prev = jnp.zeros((B, S), jnp.float32)      # unused: first=1
    if first is None:
        first = jnp.ones((1,), jnp.int32)
    if bstar_in is None:
        bstar_in = jnp.full((B, S), NEG_INF, jnp.float32)
    rev = lambda j: (0, NI - 1 - j, 0)
    revm = lambda j: (NI - 1 - j, 0, 0)
    prev = lambda j: (jnp.maximum(NI - 2 - j, 0), 0, 0)
    const2 = lambda j: (0, 0)
    scratch = [
        pltpu.VMEM((B, S), jnp.float32),
        pltpu.VMEM((K, B, S), jnp.float32),
    ]
    if jnp.dtype(post_dtype) != jnp.float32:
        scratch.append(pltpu.VMEM((B, K, S), jnp.float32))
    post, bstar_out = pallas_vma.pallas_call(
        functools.partial(_beta_post_ckpt_kernel, K),
        grid=(NI,),
        in_specs=[
            pl.BlockSpec((B, K, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, S), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1, B), revm, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, B), revm, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, K, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, S), post_dtype),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(K, B, S),
        ),
        cost_estimate=pl.CostEstimate(
            flops=22 * T * B * S,
            bytes_accessed=T * B * S * (8 + jnp.dtype(post_dtype).itemsize),
            transcendentals=9 * T * B * S,
        ),
    )(lp_ext, ckpts, ckpt_prev, first, islast, live, skip_ok, skipn2,
      beta_init, logp, bstar_in)
    return post, bstar_out


def _posteriors_pallas(lp_ext, alphas, islast, live, skipn2, beta_init,
                       logp, post_dtype=jnp.float32):
    """Returns the lattice-state posteriors (B, T, S); T must be a multiple
    of ``_time_block(B, S)`` (padded steps have live=0 and emit zeros).

    ``post_dtype`` narrows only the OUTPUT stream: the beta recursion and
    the alpha+beta combination stay f32 in VMEM.  Posteriors are exp-space
    values in [0, 1], so bf16's 2^-9 relative rounding is a bounded ~0.2 %
    error on the gradient's label term — unlike the log-space alpha / lp
    streams, whose magnitudes reach O(1000) and would lose whole units to
    bf16.  At B=128/T=3510/S=1201 this halves a 2.14 GB HBM temp (and its
    read-back), which is what lets whole-sequence B=128 training fit."""
    B, T, S = lp_ext.shape
    K = _time_block(B, S)
    assert T % K == 0, (T, K)
    NI = T // K
    rev = lambda i: (0, NI - 1 - i, 0)
    revm = lambda i: (NI - 1 - i, 0, 0)
    scratch = [pltpu.VMEM((B, S), jnp.float32)]
    if jnp.dtype(post_dtype) != jnp.float32:
        scratch.append(pltpu.VMEM((B, K, S), jnp.float32))
    (post,) = pallas_vma.pallas_call(
        functools.partial(_beta_post_kernel, K),
        grid=(NI,),
        in_specs=[
            pl.BlockSpec((B, K, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, B), revm, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, B), revm, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, K, S), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T, S), post_dtype)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(K, B, S),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * T * B * S,
            bytes_accessed=T * B * S * (8 + jnp.dtype(post_dtype).itemsize),
            transcendentals=5 * T * B * S,
        ),
    )(lp_ext, alphas, islast, live, skipn2, beta_init, logp)
    return post


def _split_matmul(x, onehot, spec, terms=2):
    """MXU substitute for a big gather: contract against an exact-in-bf16
    one-hot matrix.  A (T, B, S)-shaped ``take_along_axis`` lowers to a slow
    scatter/gather loop on TPU (~550 ms at reference shapes vs ~13 ms here).
    DEFAULT-precision f32 matmuls round operands to bf16, so split x into
    bf16-exact terms plus a residual: every term's product is exact except
    the last, whose error is ~2^(-8*terms) relative (2 terms ~1e-5; 3 terms
    is effectively f32-exact, which matters for values that a recursion
    then accumulates over thousands of steps)."""
    out = 0.0
    for k in range(terms):
        part = x.astype(jnp.bfloat16).astype(jnp.float32)
        x = x - part
        if k == terms - 1:
            part = part + x                 # fold the final residual in
        # Keep XLA's algebraic simplifier from re-associating the summed
        # dots back into dot(hi+lo, onehot), which undoes the split.
        part = jax.lax.optimization_barrier(part)
        out = out + jnp.einsum(spec, part, onehot,
                               preferred_element_type=jnp.float32)
    return out


def _lattice_inputs(log_probs, logit_lengths, labels, label_lengths,
                    blank_id):
    """Returns lattice streams padded in time to a multiple of the kernel
    time block (padded steps carry live=0, which freezes the alpha
    recursion and zeroes the posteriors — exact no-ops).

    The lp lattice stays f32 — both the forward alpha recursion and the
    backward's alpha re-run SUM it over thousands of steps, where bf16
    input rounding would compound as a log-space random walk (measured
    ~17 % relative gradient error already at T=14).  But it is built with
    ONE ``Precision.HIGHEST`` einsum rather than the hand-rolled 3-term
    split-matmul: XLA's own multi-pass f32 emulation gives the same
    bf16-exact-term decomposition internally without materializing the
    per-term (T, B, S) f32 products — the allocation family (3×~2.1 GB at
    whole-sequence B=128 reference shapes) that kept B=128 training from
    fitting HBM."""
    T, B, V = log_probs.shape
    ext, skip_ok = _prepare(labels, blank_id, V)
    S = ext.shape[1]
    Tp = -(-T // _time_block(B, S)) * _time_block(B, S)
    if Tp != T:
        log_probs = jnp.pad(log_probs, ((0, Tp - T), (0, 0), (0, 0)))
    onehot = jax.nn.one_hot(ext, V, dtype=jnp.float32)    # (B, S, V)
    # Batch-major lattice: dot_general output is (batch, lhs_rest,
    # rhs_rest) = (B, T, S) exactly — the time-major "tbv,bsv->tbs" form
    # made XLA materialize the dot as (B, S, T) plus a full-lattice f32
    # layout-transposition copy (2x~1.6 GB at B=96 flagship shapes, the
    # peak allocations that kept whole-sequence B=96 training from
    # compiling).  The (B, T, V) transpose of log_probs is ~30x smaller.
    lp_ext = jax.lax.dot_general(
        jnp.transpose(log_probs, (1, 0, 2)), onehot,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                     # (B, Tp, S)
    live = (
        jnp.arange(Tp)[:, None] < logit_lengths[None, :]
    ).astype(jnp.float32)[:, None, :]                     # (Tp, 1, B)
    return ext, skip_ok.astype(jnp.float32), lp_ext, live


def _chunk_plan(B: int, Tp: int, S: int):
    """(K, G, NC): time block, K-blocks per chunk, chunk count for the
    time-chunked fwd/bwd scans.  Chunks engage only when the lattice is
    large enough to matter (>= 256 MB) — or always under
    RST_CTC_CHUNKED=force (tests); "0" disables."""
    import os

    K = _time_block(B, S)
    M = Tp // K
    G = M
    mode = os.environ.get("RST_CTC_CHUNKED", "1")
    if mode == "force" and M > 1:
        G = 1
    elif mode != "0" and B * Tp * S * 4 >= (256 << 20):
        for cand in range(1, M + 1):
            if M % cand == 0 and cand * K >= 512:
                G = cand
                break
    return K, G, M // G


def _ctc_fwd_impl(logits, logit_lengths, labels, label_lengths, blank_id,
                  want_residuals):
    T, B, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    if want_residuals:
        # Training forward: chunk the lattice construction + alpha
        # checkpoint kernel over time when the lattice is large (the
        # whole (B, Tp, S) f32 lattice was the forward-side HBM peak at
        # B=96 flagship shapes), carrying the alpha row across chunks.
        ext, skip_ok = _prepare(labels, blank_id, V)
        skip_f = skip_ok.astype(jnp.float32)
        S = ext.shape[1]
        K, G, NC = _chunk_plan(B, -(-T // _time_block(B, S))
                               * _time_block(B, S), S)
        Tp = NC * G * K
        lp_pad = log_probs
        if Tp != T:
            lp_pad = jnp.pad(log_probs, ((0, Tp - T), (0, 0), (0, 0)))
        onehot = jax.nn.one_hot(ext, V, dtype=jnp.float32)
        live = (
            jnp.arange(Tp)[:, None] < logit_lengths[None, :]
        ).astype(jnp.float32)[:, None, :]                 # (Tp, 1, B)
        if NC > 1:
            C = G * K
            lp_chunks = jnp.transpose(lp_pad, (1, 0, 2)).reshape(
                B, NC, C, V).transpose(1, 0, 2, 3)        # (NC, B, C, V)
            live_chunks = live.reshape(NC, C, 1, B)
            firsts = (jnp.arange(NC) == 0).astype(jnp.int32)[:, None]

            def body(alpha, xs):
                lp_bv, liv, fst = xs
                lp_c = jax.lax.dot_general(
                    lp_bv, onehot,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )                                         # (B, C, S)
                ck, alpha = _alphas_pallas(
                    lp_c, liv, skip_f, emit_alphas="ckpt",
                    alpha_in=alpha, first=fst[0:1],
                )
                return alpha, ck

            alpha0 = jnp.full((B, S), NEG_INF, jnp.float32)
            last, ck_chunks = jax.lax.scan(
                body, alpha0, (lp_chunks, live_chunks, firsts)
            )                                             # (NC, G, B, S)
            ckpts = ck_chunks.reshape(NC * G, B, S)
        else:
            lp_ext = jax.lax.dot_general(
                jnp.transpose(lp_pad, (1, 0, 2)), onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            ckpts, last = _alphas_pallas(lp_ext, live, skip_f,
                                         emit_alphas="ckpt")
        logp = _terminal_logp(last, label_lengths)
        valid = (label_lengths <= logit_lengths) & (logit_lengths > 0)
        loss = jnp.where(valid, -logp, 0.0)
        residuals = (log_probs, ckpts, logp, ext, skip_f, live,
                     logit_lengths, label_lengths, valid)
        return loss, residuals

    # Loss-only (eval) forward: whole lattice + loss-only alpha kernel —
    # no residuals, memory is not the constraint there.  The (T, B, S)
    # f32 alphas stream never hits HBM in ANY pass; the training
    # forward/backward never materialize even the lattice whole (the
    # chunked scans above / in _ctc_bwd), and the lattice is NOT a
    # residual: the backward re-derives it from log_probs (30x smaller)
    # behind an optimization barrier — carried across the LSTM residual
    # production instead, XLA remat-"compressed" the 1.6 GB buffer into
    # a second layout-changed copy and both coexisted at the HBM peak
    # (measured +1.54 GB at B=96 flagship shapes).
    ext, skip_f, lp_ext, live = _lattice_inputs(
        log_probs, logit_lengths, labels, label_lengths, blank_id
    )
    _, last = _alphas_pallas(lp_ext, live, skip_f, emit_alphas=False)
    logp = _terminal_logp(last, label_lengths)
    valid = (label_lengths <= logit_lengths) & (logit_lengths > 0)
    return jnp.where(valid, -logp, 0.0), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id=-1,
             post_dtype=jnp.float32):
    """Per-example CTC negative log-likelihood, shape (B,). Pallas-fused.

    ``post_dtype`` (nondiff, default f32 = byte-identical to the original
    kernels) selects the dtype of the backward's (T, B, S) posterior
    stream — see ``_posteriors_pallas``.  The training step passes bf16
    when the model itself computes in bf16."""
    loss, _ = _ctc_fwd_impl(logits, logit_lengths, labels, label_lengths,
                            blank_id, want_residuals=False)
    return loss


def _ctc_fwd(logits, logit_lengths, labels, label_lengths, blank_id,
             post_dtype):
    return _ctc_fwd_impl(logits, logit_lengths, labels, label_lengths,
                         blank_id, want_residuals=True)


def _ctc_bwd(blank_id, post_dtype, residuals, g):
    (log_probs, ckpts, logp, ext, skip_f, live,
     logit_lengths, label_lengths, valid) = residuals
    T, B, V = log_probs.shape                 # log_probs is unpadded …
    Tp = live.shape[0]                        # … live carries the pad
    S = ext.shape[1]
    onehot = jax.nn.one_hot(ext, V, dtype=jnp.float32)    # (B, S, V)

    # Re-derive the f32 lattice for this pass only (see _ctc_fwd_impl):
    # same batch-major HIGHEST-precision dot as the forward, on
    # barrier-wrapped log_probs so the two dots stay distinct HLO and the
    # lattice's live range never spans the LSTM residual production.
    # (In the chunked path below the dot itself runs per chunk, so not
    # even one pass's worth of whole lattice is ever materialized.)
    lp_b = jax.lax.optimization_barrier(log_probs)
    if Tp != T:
        lp_b = jnp.pad(lp_b, ((0, Tp - T), (0, 0), (0, 0)))

    def _lattice_dot(lp_pad, oh):
        return jax.lax.dot_general(
            jnp.transpose(lp_pad, (1, 0, 2)), oh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                                 # (B, Tp, S)

    # Terminal beta at each row's last valid frame.
    s_idx = jnp.arange(S)[None, :]
    end = (2 * label_lengths)[:, None]
    beta_init = jnp.where(
        (s_idx == end) | ((s_idx == end - 1) & (label_lengths[:, None] > 0)),
        0.0,
        NEG_INF,
    )
    islast = (
        jnp.arange(Tp)[:, None] == (logit_lengths - 1)[None, :]
    ).astype(jnp.float32)[:, None, :]                     # (Tp, 1, B)
    skipn2 = jnp.concatenate(
        [skip_f[:, 2:], jnp.zeros_like(skip_f[:, :2])], axis=1
    )

    import os

    # Chunk the backward over time: rebuild the lattice AND consume the
    # posteriors per ~512-step chunk inside a reverse scan (beta state
    # carried through the kernel's bstar in/out), so neither the f32
    # lattice (1.6 GB at B=96 flagship shapes) nor the posterior stream
    # (0.8 GB) ever exists whole — they were the CTC-stage HBM peak that
    # made whole-sequence B=96 training fit only on lucky compiles.
    K, G, NC = _chunk_plan(B, Tp, S)

    def _label_post(post_c, oh):
        if jnp.dtype(post_dtype) == jnp.bfloat16:
            # bf16 posteriors feed the MXU natively — no split terms
            # needed (the split exists to repair f32->bf16 operand
            # rounding, and a bf16 stream is already bf16-exact) and no
            # f32 copy of the stream is ever materialized.  Non-TPU dot
            # thunks reject bf16 operands, so those platforms upcast —
            # same numerics (both operands are bf16-exact).  Branch on
            # the actual LOWERING platform, not jax.default_backend().
            def _mxu_native(a, o):
                return jnp.einsum(
                    "bts,bsv->btv", a, o.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )

            def _upcast(a, o):
                return jnp.einsum(
                    "bts,bsv->btv", a.astype(jnp.float32), o,
                    preferred_element_type=jnp.float32,
                )

            return jax.lax.platform_dependent(
                post_c, oh, tpu=_mxu_native, default=_upcast,
            )
        return _split_matmul(post_c, oh, "bts,bsv->btv")

    if os.environ.get("RST_CTC_ALPHA_STREAM", "0") == "1":
        # A/B fallback: materialize the full alpha stream (the round-4
        # two-pass backward) instead of the fused checkpoint rebuild.
        lp_ext = _lattice_dot(lp_b, onehot)
        alphas, _ = _alphas_pallas(lp_ext, live, skip_f, emit_alphas=True)
        post = _posteriors_pallas(
            lp_ext, alphas, islast, live, skipn2, beta_init, logp[:, None],
            post_dtype=post_dtype,
        )
        label_post = _label_post(post[:, :T], onehot)
    elif NC > 1:
        C = G * K
        lp_chunks = jnp.transpose(lp_b, (1, 0, 2)).reshape(
            B, NC, C, V).transpose(1, 0, 2, 3)            # (NC, B, C, V)
        isl_chunks = islast.reshape(NC, C, 1, B)
        live_chunks = live.reshape(NC, C, 1, B)
        ckpt_chunks = ckpts.reshape(NC, G, B, S)
        ckpt_prevs = jnp.concatenate(
            [jnp.zeros((1, B, S), jnp.float32), ckpts[G - 1::G][:-1]],
            axis=0,
        )                                                 # (NC, B, S)
        firsts = (jnp.arange(NC) == 0).astype(jnp.int32)[:, None]

        def body(bstar, xs):
            lp_bv, isl, liv, ck, ckp, fst = xs
            lp_c = jax.lax.dot_general(
                lp_bv, onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                             # (B, C, S)
            post_c, bstar = _posteriors_from_ckpt_pallas(
                lp_c, ck, isl, liv, skip_f, skipn2, beta_init,
                logp[:, None], post_dtype=post_dtype,
                ckpt_prev=ckp, first=fst[0:1], bstar_in=bstar,
            )
            return bstar, _label_post(post_c, onehot)

        bstar0 = jnp.full((B, S), NEG_INF, jnp.float32)
        _, lp_out = jax.lax.scan(
            body, bstar0,
            (lp_chunks, isl_chunks, live_chunks, ckpt_chunks,
             ckpt_prevs, firsts),
            reverse=True,
        )                                                 # (NC, B, C, V)
        label_post = lp_out.transpose(1, 0, 2, 3).reshape(
            B, Tp, V)[:, :T]
    else:
        lp_ext = _lattice_dot(lp_b, onehot)
        post, _ = _posteriors_from_ckpt_pallas(
            lp_ext, ckpts, islast, live, skip_f, skipn2, beta_init,
            logp[:, None], post_dtype=post_dtype,
        )
        label_post = _label_post(post[:, :T], onehot)
    # (B, T, V) -> (T, B, V): a small transpose (V is the vocab, ~30x
    # narrower than the lattice the old layout transposed).
    grad = jnp.exp(log_probs) - jnp.transpose(label_post, (1, 0, 2))

    t_mask = jnp.transpose(live[:T] > 0, (0, 2, 1))       # (T, B, 1)
    grad = jnp.where(t_mask, grad, 0.0)
    grad = grad * jnp.where(valid, 1.0, 0.0)[None, :, None]
    grad = grad * g[None, :, None]
    return (grad.astype(jnp.float32), None, None, None)


ctc_loss.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_mean(logits, logit_lengths, labels, label_lengths, blank_id=-1):
    from rnn_speech_tpu.ops.ctc import mean_of

    return mean_of(ctc_loss, logits, logit_lengths, labels, label_lengths,
                   blank_id)
