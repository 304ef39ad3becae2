"""Acoustic model: input projection -> stacked LSTM -> output projection.

Functional rebuild of the reference's AcousticModel graph
(/root/reference/models/AcousticModel.py:189-317): per-timestep input
projection, optional batch normalization over the batch axis, N stacked
LSTM cells with dropout during training, an output projection to the char
map, with explicit carried recurrent state (the reference held state in TF
Variables to survive session.run boundaries; here state is a value the
caller threads through, which is also what makes the streaming ``--record``
mode and the stochastic state-reset policy trivially functional).

The forward is a pure function of (params, state, inputs) — jit/pjit/vmap
compose with it directly.  Time-major (T, B, D) layout throughout.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnn_speech_tpu.ops import lstm

Params = Dict[str, Any]
States = List[lstm.LayerState]


@dataclass(frozen=True)
class AcousticConfig:
    num_layers: int
    hidden_size: int
    input_dim: int
    num_labels: int
    normalization: bool = False
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    remat: bool = False
    time_chunk: int = 0     # rematerialized scan chunking (0 = whole seq)
    # Backward-residual strategy of the fused recurrence: "gates" streams
    # activated gates (cheapest backward), "recompute" stores only the
    # cell sequence and rebuilds gates in the backward kernel (~40% of
    # the residual bytes — fits whole-sequence batches gates mode cannot,
    # e.g. B=96 at T=3510).  training_memory_plan() picks this
    # automatically.
    residual_mode: str = "gates"
    # Fuse the whole layer stack into one diagonal-walking Pallas kernel
    # (ops/lstm_wavefront.py): the L per-layer matmuls at a diagonal are
    # data-independent, keeping the MXU pipeline fed — measured 1.9-2.4x
    # over the layered schedule at flagship shapes.  Identical math
    # (requires use_pallas, >= 2 layers, gates-mode residuals; falls back
    # to the layered path otherwise).
    wavefront: bool = False
    # Stack N adjacent frames and subsample time by N before the LSTM
    # (Sak et al., arXiv:1507.06947; arXiv:1705.05992): the recurrence —
    # the sequential, latency-bound part — runs over T/N steps on an
    # N*input_dim-wide input, so the MXU sees wider matmuls and the scan
    # is N x shorter.  Changes the model (logits at a 10*N ms frame rate);
    # CTC needs T/N >= label length, so keep N small (2-3) for long
    # transcripts.  1 = off (reference behavior).
    frame_stack: int = 1


def init_params(key: jax.Array, cfg: AcousticConfig) -> Params:
    k_in, k_lstm, k_out = jax.random.split(key, 3)
    in_dim = cfg.input_dim * max(cfg.frame_stack, 1)
    return {
        "input": {
            "w": lstm.xavier_uniform(k_in, (in_dim, cfg.hidden_size)),
            "b": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "lstm": lstm.init_lstm_stack(
            k_lstm, cfg.num_layers, cfg.hidden_size, cfg.hidden_size
        ),
        "output": {
            "w": lstm.xavier_uniform(k_out, (cfg.hidden_size, cfg.num_labels)),
            "b": jnp.zeros((cfg.num_labels,), jnp.float32),
        },
    }


def zero_state(cfg: AcousticConfig, batch_size: int) -> States:
    return lstm.zero_state(cfg.num_layers, batch_size, cfg.hidden_size)


def _batch_norm(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Normalize over the batch axis per (time, feature) — the reference's
    tf.nn.moments(axes=[1]) + batch_normalization with no scale/offset.

    Deviation: with batch size 1 the reference's formula degenerates to
    identically-zero activations (mean == x, var == 0), which makes
    batch-1 inference (``--file``/``--record``) independent of the audio.
    The batch axis is static under jit, so we make B == 1 an identity
    instead of silently erasing the input."""
    if x.shape[1] == 1:
        return x
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def stack_frames(
    x: jnp.ndarray, seq_lengths: jnp.ndarray, n: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T, B, D) -> (ceil(T/n), B, n*D) by concatenating adjacent frames;
    lengths become ceil(len/n).  A boundary frame may mix valid and padded
    sub-frames; padding sub-frames are zero."""
    T, B, D = x.shape
    T_pad = -(-T // n) * n
    if T_pad != T:
        x = jnp.pad(x, ((0, T_pad - T), (0, 0), (0, 0)))
    x = x.reshape(T_pad // n, n, B, D).transpose(0, 2, 1, 3).reshape(
        T_pad // n, B, n * D
    )
    return x, -(-seq_lengths // n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dense(h, w, b, cd):
    """x·W + b with the weight/bias gradients computed by the fused Pallas
    contraction (ops/grad_matmul_pallas.py) instead of XLA's tall-k
    reduction einsums — the input and output projections share the LSTM
    backward's dominant reduction shape (N = T*B rows).  Primal is
    byte-identical to the plain dot; only the VJP routing changes."""
    return (
        jnp.dot(h.astype(cd), w.astype(cd), preferred_element_type=jnp.float32)
        + b
    )


def _dense_fwd(h, w, b, cd):
    # Zero-size token carries b's dtype for the cotangent cast.
    return _dense(h, w, b, cd), (h, w, jnp.zeros((0,), b.dtype))


def _dense_bwd(cd, residuals, g):
    from rnn_speech_tpu.ops.grad_matmul_pallas import weight_grad

    h, w, b_token = residuals
    dh = jnp.dot(
        g.astype(cd), w.astype(cd).T, preferred_element_type=jnp.float32
    ).astype(h.dtype)
    dw, db = weight_grad(h, g, compute_dtype=cd)
    return dh, dw.astype(w.dtype), db.astype(b_token.dtype)


_dense.defvjp(_dense_fwd, _dense_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _dropped_dense(keep, cd, key, h, w, b):
    """drop(h)·W + b as ONE custom-VJP op: the top dropout site fused
    with the output projection.  The backward REBUILDS the dropped copy
    from the undropped residual + the site's PRNG key (the site's mask
    bits are a pure function of the key) instead of carrying it — the
    dropped (T, B, H) stream is 658 MB of the B=96 flagship HBM peak.
    Dropout is a diagonal linear map, so dh = the same mask·scale
    applied to the projection's input cotangent."""
    from rnn_speech_tpu.ops import lstm

    _, dropped = lstm._dropout_site(key, h, [keep], True)
    return (
        jnp.dot(dropped.astype(cd), w.astype(cd),
                preferred_element_type=jnp.float32) + b
    )


def _dropped_dense_fwd(keep, cd, key, h, w, b):
    out = _dropped_dense(keep, cd, key, h, w, b)
    return out, (key, h, w, jnp.zeros((0,), b.dtype))


def _dropped_dense_bwd(keep, cd, residuals, g):
    from rnn_speech_tpu.ops import lstm
    from rnn_speech_tpu.ops.grad_matmul_pallas import weight_grad

    key, h, w, b_token = residuals
    _, dropped = lstm._dropout_site(key, h, [keep], True)   # rebuild
    dy = jnp.dot(
        g.astype(cd), w.astype(cd).T, preferred_element_type=jnp.float32
    )
    _, dh = lstm._dropout_site(key, dy, [keep], True)       # mask·scale⊙dy
    dw, db = weight_grad(dropped, g, compute_dtype=cd)
    dkey = np.zeros(key.shape, jax.dtypes.float0)
    return dkey, dh.astype(h.dtype), dw.astype(w.dtype), \
        db.astype(b_token.dtype)


_dropped_dense.defvjp(_dropped_dense_fwd, _dropped_dense_bwd)


def forward(
    params: Params,
    cfg: AcousticConfig,
    inputs: jnp.ndarray,          # (T, B, input_dim)
    seq_lengths: jnp.ndarray,     # (B,)
    states: States,
    *,
    dropout_rng: Optional[jax.Array] = None,
    input_keep_prob: float = 1.0,
    output_keep_prob: float = 1.0,
) -> Tuple[jnp.ndarray, States]:
    """Returns (logits (T', B, num_labels), new recurrent states), where
    T' = ceil(T / frame_stack) (== T without frame stacking).

    Pass ``dropout_rng=None`` for inference (keep probabilities ignored).
    """
    if cfg.frame_stack > 1:
        inputs, seq_lengths = stack_frames(inputs, seq_lengths, cfg.frame_stack)
    cd = cfg.compute_dtype
    dense = _dense if cfg.use_pallas else (
        lambda h, w, b, cd: jnp.dot(
            h.astype(cd), w.astype(cd), preferred_element_type=jnp.float32
        ) + b
    )
    x = dense(inputs, params["input"]["w"], params["input"]["b"], cd)
    if cfg.normalization:
        x = _batch_norm(x)

    # Hand the output projection to the stack as its head: on the
    # wavefront train path the fused form owns the top dropout site too
    # (_dropped_dense), so the dropped (T, B, H) copy is not a backward
    # residual (658 MB of the B=96 flagship HBM peak).
    head = (lambda h: dense(h, params["output"]["w"],
                            params["output"]["b"], cd))
    head_fused = None
    if cfg.use_pallas:
        head_fused = (lambda key, h: _dropped_dense(
            float(output_keep_prob), cd, key, h,
            params["output"]["w"], params["output"]["b"]))
    logits, new_states = lstm.lstm_stack(
        params["lstm"], x, seq_lengths, states,
        compute_dtype=cd,
        dropout_rng=dropout_rng,
        input_keep_prob=input_keep_prob,
        output_keep_prob=output_keep_prob,
        use_pallas=cfg.use_pallas,
        remat=cfg.remat,
        time_chunk=cfg.time_chunk,
        residual_mode=cfg.residual_mode,
        wavefront=cfg.wavefront,
        head=head,
        head_fused=head_fused,
    )
    return logits, new_states


def output_lengths(cfg: AcousticConfig, frame_lengths: jnp.ndarray) -> jnp.ndarray:
    """Valid logit count per example for ``forward``'s output: the input
    frame count subsampled by frame_stack (identity when stacking is off).
    Pair THIS with the logits in CTC loss / decoders."""
    if cfg.frame_stack > 1:
        return -(-frame_lengths // cfg.frame_stack)
    return frame_lengths


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


# ------------------------------------------------- training memory policy

#: Residual-footprint budget for the LSTM stack's backward pass.  A v5e
#: chip has 16 GiB of HBM; the margin left for parameters + Adam state
#: (~0.5 GiB at 3x1024), batch/logit/CTC-lattice tensors and XLA
#: transients is calibrated on-chip: at reference shapes (3x1024,
#: T=3510) bf16-residual whole-sequence training compiles and runs at
#: B=64 (estimate 12.4 GiB -> 316 ms/step, 202 utt/s — 1.5x the round-1
#: number), while B=128 with chunk 1024 (chunked estimate ~14 GiB with
#: transients) overflows at compile.
DEFAULT_RESIDUAL_BUDGET = 12_900 << 20


def training_residual_bytes(
    cfg: AcousticConfig, T: int, B: int, residual_mode: str = "gates"
) -> int:
    """Estimated backward-residual HBM footprint of the whole-sequence LSTM
    stack at T frames (post frame-stacking) and device batch B.

    ``"gates"`` stores per layer/step the activated gates (4H, residual
    dtype) and the carried cell (H, residual dtype).  Under the wavefront
    schedule the layer-output streams are also residual-dtype, the
    backward's dgates alias onto the gates residuals, the boundary dW_x
    contractions accumulate in-kernel and the top dropout site + output
    projection rematerialize together (ops/lstm_wavefront.py,
    lstm.lstm_stack) — per layer/step exactly 6H residual-dtype bytes,
    verified on-chip: B=96 (11.6 GiB by this estimate) compiles and runs
    whole-sequence.  The LAYERED path keeps f32 layer outputs/inputs in
    the surrounding autodiff (2 * 4H bytes extra).  ``"recompute"``
    stores only residual-dtype copies of the cell sequence, layer output
    and layer input (3H bytes at bf16) — gates are rebuilt inside the
    backward kernel."""
    H = cfg.hidden_size
    L = cfg.num_layers
    rb = 2 if jnp.dtype(cfg.compute_dtype) == jnp.bfloat16 else 4
    if residual_mode == "recompute":
        per_step_layer = B * 3 * H * rb
    elif getattr(cfg, "wavefront", False) and cfg.use_pallas:
        per_step_layer = B * H * rb * 6
    else:
        per_step_layer = B * (4 * H * rb + H * rb + 8 * H)
    return int(L * T * per_step_layer)


def training_memory_plan(
    cfg: AcousticConfig,
    T: int,
    B: int,
    budget_bytes: int = DEFAULT_RESIDUAL_BUDGET,
) -> Tuple[int, str]:
    """(time_chunk, residual_mode) for training at these shapes.

    Preference order, measured on a v5e at 3x1024 / T=3510:
      1. whole-sequence, gates residuals — fastest backward (round 5:
         B=64 264 ms/step 242 utt/s; B=96 fits whole-sequence under the
         wavefront memory contract at 399 ms / 241 utt/s)
      2. whole-sequence, recompute residuals — gates rebuilt in the
         backward kernel (two extra VMEM-resident matmuls per step, bf16
         inter-layer activations): slower per row but fits batches the
         gates residuals cannot, and beats chunked remat there
      3. chunked remat with gates residuals (double forward; last resort
         — B=128 whole-sequence gates residuals alone are ~15.4 GiB,
         the full HBM)
    """
    if training_residual_bytes(cfg, _stacked_T(cfg, T), B) <= budget_bytes:
        return 0, "gates"
    # Recompute mode additionally holds one layer's dgates emission, the
    # dout cotangent stream and an activation copy alongside its
    # residuals (terms calibrated on-chip: B=96 compiles, B=128 does not).
    rb = 2 if jnp.dtype(cfg.compute_dtype) == jnp.bfloat16 else 4
    Ts = _stacked_T(cfg, T)
    H = cfg.hidden_size
    recompute = (
        training_residual_bytes(cfg, Ts, B, "recompute")
        + Ts * B * 4 * H * rb        # dgates transient
        + Ts * B * 4 * H             # dout + activation-copy streams
    )
    if cfg.use_pallas and recompute <= budget_bytes:
        return 0, "recompute"
    return auto_time_chunk(cfg, T, B, budget_bytes), "gates"


def _stacked_T(cfg: AcousticConfig, T: int) -> int:
    return -(-T // max(cfg.frame_stack, 1))


def auto_time_chunk(
    cfg: AcousticConfig,
    T: int,                      # input frame count (pre frame-stacking)
    B: int,                      # device-local batch width
    budget_bytes: int = DEFAULT_RESIDUAL_BUDGET,
) -> int:
    """Pick a ``time_chunk`` so training's activation memory fits in HBM.

    Returns 0 (no chunking) whenever the whole-sequence residuals fit —
    chunked remat costs one extra forward recurrence, so it should engage
    only when the footprint demands it (VERDICT r1 #1: B >= 64 at T = 3510
    exceeds a v5e's HBM with whole-sequence residuals).  Otherwise returns
    the largest chunk from a fixed candidate ladder whose chunked footprint
    (chunk-interior residuals + f32 input/output stacks + per-boundary
    carried states) fits the budget."""
    stack = max(cfg.frame_stack, 1)
    T = -(-T // stack)
    if training_residual_bytes(cfg, T, B) <= budget_bytes:
        return 0
    H, L = cfg.hidden_size, cfg.num_layers
    rb = 2 if jnp.dtype(cfg.compute_dtype) == jnp.bfloat16 else 4
    per_step_layer = B * (4 * H * rb + H * rb + 8 * H)
    # Chunked execution additionally holds a chunk's f32 gate projection
    # (x @ W_x, 4H wide) and its dgates emission live alongside the
    # interior residuals — without these terms the ladder picks chunk
    # widths that overflow at compile (measured: B=128 chunk=1024 at
    # 3x1024 T=3510 fails, chunk=512 runs).
    per_step_transient = B * 4 * H * (4 + rb)
    fixed = T * B * 8 * H          # f32 input + output stacks of the scan
    for chunk in (1024, 512, 256, 128):
        if chunk >= T:
            continue
        n_chunks = -(-T // chunk)
        boundaries = n_chunks * L * 2 * B * H * 4
        if (fixed + L * chunk * per_step_layer
                + chunk * per_step_transient + boundaries) <= budget_bytes:
            return chunk
    return 128
