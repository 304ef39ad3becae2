"""Fused Pallas TPU kernel for the fbank spectrogram pipeline.

The XLA path in ``ops/frontend_jax.py`` materializes the framed signal
(B, T, frame_len) and the DFT output (B, T, 2*bins) in HBM — ~540 MB of
round-trip traffic for a batch of 128 ten-second clips — because the
optimization barriers that keep XLA from mis-fusing the stages also pin
the intermediates.  This kernel fuses

    framing -> windowed DFT (MXU) -> power -> mel (MXU) -> 10*log10

into one VMEM-resident pass per (batch row, 128-frame tile): the only HBM
traffic is the raw signal in (~45 KB/tile) and the (128, 128) log-mel tile
out.  The DFT basis and mel matrix stay resident in VMEM across the whole
grid.

Framing uses the same gather-free decomposition as the XLA path
(frontend_jax.DeviceFrontend._frame): with the signal reshaped to
non-overlapping (rows, step) windows, frame t is the concatenation of rows
t..t+K-1, so a tile of 128 frames is K shifted sublane slices of one
(128+K, step) strip — no gathers, no strided loads.

Only the spectrogram stages live in the kernel.  Mean normalization and
the Savitzky-Golay deltas operate on the (B, T, 40) banks — 6000x smaller
than the framed signal — and stay in XLA where they fuse fine.

Numerics: identical operations in the same f32-HIGHEST precision as the
XLA path (pinned by tests/test_frontend.py in interpret mode and by
tools/hw_parity.py on a real chip).

Reference behavior being accelerated: util/audioprocessor.py:77-161 (the
hand-rolled fbank frontend the reference ran per-clip on host CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_speech_tpu.ops import pallas_vma

# Tiny positive stand-in for zero power before log10 — same constant as the
# XLA path (np.finfo(np.float64).eps at frontend_jax.py:253).
_EPS = float(np.finfo(np.float64).eps)

TILE_T = 128      # frames per kernel instance
MEL_PAD = 128     # mel filters padded to one lane tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fbank_kernel(pre_rows, basis_ref, mel_ref, out_ref, scratch, sem,
                  *, k_rows: int, lane: int, bins_pad: int, inv_nfft: float):
    b = pl.program_id(0)
    t = pl.program_id(1)

    strip = scratch.shape[0]        # TILE_T + K rounded up to sublane tiling
    dma = pltpu.make_async_copy(
        pre_rows.at[b, pl.ds(t * TILE_T, strip), :], scratch, sem
    )
    dma.start()
    dma.wait()

    rows = scratch[:]
    # frame t = rows t..t+K-1 concatenated.  Mosaic cannot lane-concat
    # sublane-shifted slices, so split the DFT matmul along the contraction
    # instead: spec = sum_k rows[k:k+TILE] @ basis_piece_k — identical
    # FLOPs (each 128-lane row already carries its zero lane padding and
    # each basis piece is a full 128-row slab), no concat, no slicing.
    spec = jnp.zeros((TILE_T, 2 * bins_pad), jnp.float32)
    for k in range(k_rows):
        spec = spec + jnp.dot(
            rows[k : k + TILE_T, :],
            basis_ref[k * lane : (k + 1) * lane, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                # (TILE_T, 2*bins_pad)
    power = (
        spec[:, :bins_pad] ** 2 + spec[:, bins_pad:] ** 2
    ) * inv_nfft
    banks = jnp.dot(
        power, mel_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                    # (TILE_T, MEL_PAD)
    banks = jnp.where(banks == 0.0, _EPS, banks)
    out_ref[0] = 10.0 * jnp.log10(banks)


def pad_basis_mel(basis, mel, *, n_fft: int, step: int, frame_length: int):
    """Host-side (numpy) padding of the DFT basis and mel matrix into the
    kernel's lane-aligned layouts.  Call once at DeviceFrontend init.

    Returns (kb, mp): kb is (K*step, 2*bins_pad) — the windowed basis with
    [cos | sin] halves each padded to bins_pad columns, rows past
    L_eff = min(frame_length, n_fft) exact zeros (rfft truncation); mp is
    (bins_pad, MEL_PAD)."""
    basis = np.asarray(basis)
    mel = np.asarray(mel)
    bins = n_fft // 2 + 1
    n_mels = mel.shape[1]
    bins_pad = _round_up(bins, 128)
    l_eff = min(frame_length, n_fft)
    K = -(-l_eff // step)

    # Piecewise layout: slab k (`lane` = step rounded up to 128 rows) holds
    # basis rows [k*step, (k+1)*step) in its first `step` rows; the rest
    # are zeros matching the signal rows' step->lane padding, so the kernel
    # contracts full lane-aligned tiles with no slicing.
    lane = _round_up(step, 128)
    full = np.zeros((K * step, 2 * bins_pad), np.float32)
    full[:l_eff, :bins] = basis[:l_eff, :bins]
    full[:l_eff, bins_pad : bins_pad + bins] = basis[:l_eff, bins : 2 * bins]
    kb = np.zeros((K * lane, 2 * bins_pad), np.float32)
    for k in range(K):
        kb[k * lane : k * lane + step] = full[k * step : (k + 1) * step]

    mp = np.zeros((bins_pad, MEL_PAD), np.float32)
    mp[:bins, :n_mels] = mel
    return jnp.asarray(kb), jnp.asarray(mp)


def fbank_banks_pallas(
    signals: jnp.ndarray,      # (B, S) pre-emphasized, padding-zeroed
    kb: jnp.ndarray,           # (K*step, 2*bins_pad) padded windowed basis
    mp: jnp.ndarray,           # (bins_pad, MEL_PAD) padded mel matrix
    *,
    step: int,
    n_frames: int,
    n_fft: int,
    n_mels: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Log-mel banks (B, n_frames, n_mels) via the fused kernel.

    ``n_frames`` frames at stride ``step`` (count computed by the caller's
    ``DeviceFrontend._frames_for_width`` — single source of truth); samples
    past ``n_fft`` never enter the DFT (rfft truncation), so the kernel
    only touches L_eff = min(frame_length, n_fft) per frame.
    """
    B, n_samples = signals.shape
    bins_pad = mp.shape[0]
    lane = _round_up(step, 128)
    K = kb.shape[0] // lane

    # Signal as non-overlapping (rows, step) windows lane-padded to `lane`,
    # with enough rows that every tile's strip exists.  DMA slices must be
    # 8-aligned on the sublane dim, so the per-tile strip is TILE_T + K
    # rounded up to a multiple of 8.
    n_tiles = -(-n_frames // TILE_T)
    strip = _round_up(TILE_T + K, 8)
    rows_needed = (n_tiles - 1) * TILE_T + strip
    need = rows_needed * step
    if n_samples < need:
        signals = jnp.pad(signals, ((0, 0), (0, need - n_samples)))
    pre_rows = signals[:, :need].reshape(B, rows_needed, step)
    if lane != step:
        pre_rows = jnp.pad(pre_rows, ((0, 0), (0, 0), (0, lane - step)))

    kernel = functools.partial(
        _fbank_kernel, k_rows=K, lane=lane, bins_pad=bins_pad,
        inv_nfft=1.0 / n_fft,
    )
    out = pallas_vma.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # pre_rows (HBM)
            pl.BlockSpec(
                (K * lane, 2 * bins_pad), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bins_pad, MEL_PAD), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, MEL_PAD), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * TILE_T, MEL_PAD), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((strip, lane), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(pre_rows, kb, mp)
    return out[:, :n_frames, :n_mels]
