"""Stacked LSTM recurrence: functional, time-major, TPU-first.

Capability parity with the reference's RNN core — ``BasicLSTMCell`` stacks
under time-major ``dynamic_rnn`` with sequence-length masking, carried state
and per-cell dropout (/root/reference/models/AcousticModel.py:222-298) — but
the design is JAX-native:

  * Explicit parameter/state pytrees; no variables.  The reference's
    persistent hidden-state Variables (state carried across session.run
    calls for streaming) become explicit ``(h, c)`` carries returned to the
    caller.
  * The input contribution ``x @ W_x + b`` for *all* timesteps of a layer is
    one large matmul before the scan (MXU-shaped: (T*B, D) @ (D, 4H)); the
    scan body only does the recurrent (B, H) @ (H, 4H) matmul.
  * Gate dynamics match ``BasicLSTMCell``: gate order (i, g, f, o) with
    forget-gate bias +1.0; outputs past an example's true length are zero
    and its state freezes at the last valid step (dynamic_rnn semantics).
  * Dropout (input/output keep probabilities per cell, fresh mask each
    timestep) is applied as elementwise work on the (T, B, ·) tensors
    outside the scan, where XLA fuses it into the projections.
  * An optional fused Pallas kernel (``lstm_pallas``) replaces the scan for
    the recurrence on TPU; ``lax.scan`` is the autodiff/CPU path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
LayerState = Tuple[jnp.ndarray, jnp.ndarray]  # (c, h), each (B, H)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_lstm_stack(
    key: jax.Array,
    num_layers: int,
    input_size: int,
    hidden_size: int,
    dtype=jnp.float32,
) -> List[Params]:
    """Initialize a stack: layer l maps (input_size if l==0 else H) -> H."""
    layers = []
    for l in range(num_layers):
        key, k1, k2 = jax.random.split(key, 3)
        in_dim = input_size if l == 0 else hidden_size
        layers.append(
            {
                "w_x": xavier_uniform(k1, (in_dim, 4 * hidden_size), dtype),
                "w_h": xavier_uniform(k2, (hidden_size, 4 * hidden_size), dtype),
                "b": jnp.zeros((4 * hidden_size,), dtype),
            }
        )
    return layers


def zero_state(
    num_layers: int, batch_size: int, hidden_size: int, dtype=jnp.float32
) -> List[LayerState]:
    return [
        (
            jnp.zeros((batch_size, hidden_size), dtype),
            jnp.zeros((batch_size, hidden_size), dtype),
        )
        for _ in range(num_layers)
    ]


def _cell_step(carry, inputs, w_h, compute_dtype):
    """One timestep for one layer. carry=(c, h); inputs=(x_proj_t, mask_t)."""
    c, h = carry
    x_proj_t, mask_t = inputs
    gates = x_proj_t + jnp.dot(
        h.astype(compute_dtype), w_h, preferred_element_type=jnp.float32
    )
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    # Freeze state and zero output past the true sequence end.
    m = mask_t[:, None]
    c_out = jnp.where(m, c_new, c)
    h_out = jnp.where(m, h_new, h)
    y = jnp.where(m, h_new, 0.0)
    return (c_out, h_out), y


def lstm_layer_scan(
    params: Params,
    x: jnp.ndarray,                 # (T, B, D) layer input
    seq_lengths: jnp.ndarray,       # (B,)
    state: LayerState,              # (c, h)
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, LayerState]:
    """One LSTM layer over the full sequence via lax.scan."""
    T, B, _ = x.shape
    cd = compute_dtype
    x_proj = (
        jnp.dot(x.astype(cd), params["w_x"].astype(cd), preferred_element_type=jnp.float32)
        + params["b"].astype(jnp.float32)
    )                                # (T, B, 4H) fp32 accumulated
    mask = jnp.arange(T)[:, None] < seq_lengths[None, :]  # (T, B)
    w_h = params["w_h"].astype(cd)

    def step(carry, inp):
        return _cell_step(carry, inp, w_h, cd)

    state, ys = jax.lax.scan(step, state, (x_proj, mask))
    return ys, state


def _dropout(key, x, keep_prob):
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def _dropout_site(rng, out, keeps, use_pallas):
    """One dropout site; on the Pallas path adjacent sites fuse into a
    single in-kernel-PRNG stream pass (see ops/dropout_pallas.py).
    Returns (advanced rng, dropped out)."""
    keeps = [p for p in keeps if p < 1.0]
    if rng is None or not keeps:
        return rng, out
    rng, sub = jax.random.split(rng)
    import os

    if use_pallas and os.environ.get("RST_FUSED_DROPOUT", "1") != "0":
        from rnn_speech_tpu.ops import dropout_pallas

        return rng, dropout_pallas.dropout_pallas(sub, out, keeps)
    for keep in keeps:
        sub, k = jax.random.split(sub)
        out = _dropout(k, out, keep)
    return rng, out


def _lstm_stack_wavefront(
    layers, x, seq_lengths, states, *, compute_dtype, dropout_rng,
    input_keep_prob, output_keep_prob, head=None, head_fused=None,
):
    """Whole-stack diagonal kernel (ops/lstm_wavefront.py).

    Dropout sites match the layered composition exactly in distribution:
    the input site (layer 0) and the final output site stay outside the
    kernel; each inter-layer boundary's back-to-back output+input
    Bernoulli pair collapses to ONE Bernoulli(ko*ki) bit mask (a product
    of independent Bernoullis IS a Bernoulli of the product) applied
    in-kernel with a static 1/(ko*ki) scale."""
    from rnn_speech_tpu.ops.lstm_wavefront import (
        lstm_stack_wavefront_apply,
        lstm_stack_wavefront_train,
    )

    T, B, _ = x.shape
    L = len(layers)
    H = layers[0]["w_h"].shape[0]
    rng = dropout_rng

    rng, x = _dropout_site(rng, x, [input_keep_prob], True)
    if rng is None:
        # Inference: the residual-free kernel (NOT differentiable — pass
        # dropout_rng to train).
        out, new_states = lstm_stack_wavefront_apply(
            layers, x, seq_lengths, states, compute_dtype=compute_dtype
        )
    else:
        drop_masks, drop_scale = None, 1.0
        drop_seed, drop_keep = None, 1.0
        kp = 1.0
        for p in (output_keep_prob, input_keep_prob):
            if p < 1.0:
                kp *= float(p)
        if kp < 1.0:
            import os

            rng, sub = jax.random.split(rng)
            if os.environ.get("RST_WAVEFRONT_SEED_DROP", "1") != "0":
                # Seed-mode dropout: both wavefront kernels regenerate
                # the (boundary, t) mask bits with the on-core PRNG from
                # two seed words — no (L-1, T, B, H) mask stream in HBM
                # and no separate mask-generation pass (round 5; the
                # round-4 materialized stream cost ~7 ms/step plus 2
                # (T, B, H) buffers of the batch-width memory budget).
                data = jax.random.key_data(sub).ravel().astype(jnp.uint32)
                drop_seed = jax.lax.bitcast_convert_type(
                    jnp.stack([data[0], data[-1]]), jnp.int32
                )
                drop_keep = kp
            elif os.environ.get("RST_PALLAS_MASKGEN", "1") != "0":
                # Materialized-mask fallback (A/B): core-PRNG mask gen is
                # worth ~7 ms/step over jax.random.bernoulli — the
                # threefry mask sits on the critical path before the
                # forward kernel; the Pallas pass is short enough to hide.
                from rnn_speech_tpu.ops.dropout_pallas import (
                    bernoulli_mask_pallas,
                )

                drop_masks = bernoulli_mask_pallas(
                    sub, (L - 1, T, B, H), kp, jnp.bfloat16
                )
                drop_scale = 1.0 / kp
            else:
                drop_masks = jax.random.bernoulli(
                    sub, kp, (L - 1, T, B, H)
                ).astype(jnp.bfloat16)
                drop_scale = 1.0 / kp
        out, new_states = lstm_stack_wavefront_train(
            layers, x, seq_lengths, states,
            drop_masks=drop_masks, drop_scale=drop_scale,
            drop_seed=drop_seed, drop_keep=drop_keep,
            compute_dtype=compute_dtype,
        )
    if head_fused is not None and rng is not None and \
            output_keep_prob < 1.0:
        # Fused site + head: head_fused(key, out) applies the top
        # dropout site AND the projection under ONE custom VJP whose
        # backward rebuilds the dropped copy from the undropped residual
        # + the site's PRNG key (models/acoustic.py::_dropped_dense), so
        # the dropped (T, B, H) stream is never carried to the backward.
        rng, sub = jax.random.split(rng)
        return head_fused(sub, out), new_states
    rng, out = _dropout_site(rng, out, [output_keep_prob], True)
    return (head(out) if head is not None else out), new_states


def lstm_stack(
    layers: Sequence[Params],
    x: jnp.ndarray,                        # (T, B, D)
    seq_lengths: jnp.ndarray,              # (B,)
    states: Sequence[LayerState],
    *,
    compute_dtype=jnp.float32,
    dropout_rng: Optional[jax.Array] = None,
    input_keep_prob: float = 1.0,
    output_keep_prob: float = 1.0,
    use_pallas: bool = False,
    remat: bool = False,
    time_chunk: int = 0,
    residual_mode: str = "gates",
    wavefront: bool = False,
    head=None,
    head_fused=None,
) -> Tuple[jnp.ndarray, List[LayerState]]:
    """Run the full stack. Returns (outputs (T, B, H), new per-layer states).

    ``head`` (optional callable) is applied to the final (post-dropout)
    output before returning — the output projection.  ``head_fused``
    (optional callable ``(key, out) -> logits``) additionally OWNS the
    top dropout site: on the wavefront train path it replaces the
    site + head pair with one custom-VJP op whose backward rebuilds the
    dropped copy from the undropped residual + the site's PRNG key
    (models/acoustic.py::_dropped_dense), so the dropped (T, B, H) copy
    is never a backward residual — at B=96 flagship shapes that copy is
    658 MB of the HBM peak.  Other paths apply ``head`` plainly;
    semantics are identical everywhere.

    Dropout mirrors the reference's DropoutWrapper composition: each cell
    drops its input (input_keep_prob) and its output (output_keep_prob),
    training-only (pass dropout_rng=None for inference).

    ``time_chunk > 0`` processes the sequence in rematerialized chunks of
    that many steps with carried state — activation memory in the backward
    pass drops from O(T) to O(time_chunk + T/time_chunk) at the cost of one
    forward recomputation, the long-sequence recipe from SURVEY §2c (the
    reference's streaming state chunking, applied to training memory).

    ``wavefront`` fuses the whole stack into ONE diagonal-walking Pallas
    kernel (ops/lstm_wavefront.py): per grid step the L per-layer matmuls
    are data-independent, so the MXU pipeline stays fed — measured 1.9-2.4x
    over the layered schedule at flagship shapes.  Same math (pinned by
    tests/test_lstm_wavefront.py); requires use_pallas, >= 2 layers, and
    gates-mode residuals.  Inter-layer dropout becomes precomputed scale
    masks applied in-kernel (statistically identical to the fused
    in-kernel-PRNG site it replaces).
    """
    T = x.shape[0]
    if time_chunk and T > time_chunk:
        out, new_states = _lstm_stack_chunked(
            layers, x, seq_lengths, states,
            compute_dtype=compute_dtype, dropout_rng=dropout_rng,
            input_keep_prob=input_keep_prob,
            output_keep_prob=output_keep_prob,
            use_pallas=use_pallas, time_chunk=time_chunk,
            residual_mode=residual_mode, wavefront=wavefront,
        )
        return (head(out) if head is not None else out), new_states
    if (
        wavefront and use_pallas and len(layers) >= 2
        and residual_mode == "gates" and not remat
    ):
        return _lstm_stack_wavefront(
            layers, x, seq_lengths, states,
            compute_dtype=compute_dtype, dropout_rng=dropout_rng,
            input_keep_prob=input_keep_prob,
            output_keep_prob=output_keep_prob,
            head=head, head_fused=head_fused,
        )
    out = x
    # Recompute-residual training in a low-precision compute dtype keeps
    # the inter-layer activations in that dtype too: the layer matmuls
    # cast to it anyway, the saved x/h residuals are low-precision by
    # design, and the halved activation/cotangent streams are what fit
    # the widest whole-sequence batches (B=128 at T=3510) in HBM.
    low_precision_chain = (
        use_pallas
        and residual_mode == "recompute"
        and jnp.dtype(compute_dtype) != jnp.float32
    )
    if low_precision_chain:
        out = out.astype(compute_dtype)
    new_states: List[LayerState] = []
    rng = dropout_rng

    for idx, (params, state) in enumerate(zip(layers, states)):
        # The output dropout of layer idx-1 and the input dropout of layer
        # idx are back-to-back elementwise passes; hand them to the site
        # as one fused application.
        keeps = [output_keep_prob] if idx > 0 else []
        keeps.append(input_keep_prob)
        rng, out = _dropout_site(rng, out, keeps, use_pallas)

        if use_pallas:
            from rnn_speech_tpu.ops import lstm_pallas

            layer_fn = lambda p, o, s: lstm_pallas.lstm_layer_pallas(
                p, o, seq_lengths, s, compute_dtype=compute_dtype,
                residual_mode=residual_mode,
            )
        else:
            layer_fn = lambda p, o, s: lstm_layer_scan(
                p, o, seq_lengths, s, compute_dtype=compute_dtype
            )
        if remat:
            layer_fn = jax.checkpoint(layer_fn)
        out, state = layer_fn(params, out, state)
        if low_precision_chain:
            out = out.astype(compute_dtype)
        new_states.append(state)

    rng, out = _dropout_site(rng, out, [output_keep_prob], use_pallas)
    return (head(out) if head is not None else out), new_states


def _lstm_stack_chunked(
    layers, x, seq_lengths, states, *, compute_dtype, dropout_rng,
    input_keep_prob, output_keep_prob, use_pallas, time_chunk,
    residual_mode="gates", wavefront=False,
):
    """Outer scan over rematerialized time chunks of the full stack."""
    T, B, D = x.shape
    C = time_chunk
    n_chunks = -(-T // C)
    pad = n_chunks * C - T
    xc = jnp.pad(x, ((0, pad), (0, 0), (0, 0))).reshape(n_chunks, C, B, D)
    idx = jnp.arange(n_chunks)

    def chunk_body(carry, inp):
        states, rng = carry
        x_chunk, i = inp
        # Rows ending before/inside this chunk freeze via clipped lengths.
        lens_c = jnp.clip(seq_lengths - i * C, 0, C)
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        out, states = lstm_stack(
            layers, x_chunk, lens_c, list(states),
            compute_dtype=compute_dtype, dropout_rng=sub,
            input_keep_prob=input_keep_prob,
            output_keep_prob=output_keep_prob,
            use_pallas=use_pallas, residual_mode=residual_mode,
            wavefront=wavefront,
        )
        return (states, rng), out

    chunk_body = jax.checkpoint(chunk_body)
    (states, _), outs = jax.lax.scan(
        chunk_body, (list(states), dropout_rng), (xc, idx)
    )
    H = outs.shape[-1]
    return outs.reshape(n_chunks * C, B, H)[:T], list(states)
