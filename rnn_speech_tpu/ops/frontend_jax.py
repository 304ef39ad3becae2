"""Batched on-device audio frontend (jit-compiled, static shapes).

The reference featurized on the host, one clip at a time, inside a
``tf.py_func`` (/root/reference/models/AcousticModel.py:809-822 calling
util/audioprocessor.py).  Here the whole frontend runs on the TPU *inside*
the training/eval step over a padded batch of raw audio:

    raw f32[B, S], lengths i32[B]  ->  features f32[B, T, D], frames i32[B]

TPU-first design choices:
  * The rFFT is a matmul against a precomputed windowed DFT basis — frames
    (B*T, frame_len) @ (frame_len, 2*bins).  On TPU this lands on the MXU
    and fuses with the surrounding elementwise work; FFT sizes like 551
    (25 ms @ 22.05 kHz) need no special casing.
  * The mel projection and the MFCC DCT are also matmuls.
  * All shapes are static; per-example true lengths flow through masks, so
    one compiled program serves every batch.

Numerics match the host reference (``rnn_speech_tpu.frontend``) to float32
tolerance, including the Savitzky-Golay delta's 'interp' edge handling; the
parity tests in tests/test_frontend.py pin this.  One documented deviation:
for clips longer than ``max_samples`` the host path mean-normalizes over the
full clip before truncating frames, while the device path sees pre-truncated
samples (such clips are skipped by eval in the reference anyway).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnn_speech_tpu import frontend as host

FRAME_STRIDE = host.FRAME_STRIDE
FRAME_SIZE = host.FRAME_SIZE


def _windowed_dft_basis(frame_length: int, n_fft: int, window: np.ndarray) -> np.ndarray:
    """Real-DFT basis with the analysis window folded in.

    Returns (frame_length, 2*bins): columns are [cos | -sin] so that
    ``frames @ basis`` yields Re and Im stacked; power = Re^2 + Im^2.
    ``rfft(x, n_fft)`` semantics: frames longer than n_fft are truncated
    (the window still spans the full frame), shorter ones zero-padded.
    """
    bins = n_fft // 2 + 1
    rows = min(frame_length, n_fft)
    n = np.arange(rows)[:, None]
    k = np.arange(bins)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(angle), np.sin(angle)], axis=1)  # (rows, 2*bins)
    basis = basis * window[:rows, None]
    if rows < frame_length:
        # Truncated tail contributes nothing: zero rows keep `frames @ basis`
        # shape-compatible without slicing the frame tensor.
        basis = np.concatenate(
            [basis, np.zeros((frame_length - rows, 2 * bins))], axis=0
        )
    return basis.astype(np.float32)


def _savgol_delta(x: jnp.ndarray, n_valid: jnp.ndarray, width: int = 9) -> jnp.ndarray:
    """Savitzky-Golay delta (polyorder=1, deriv=1, mode='interp') on device.

    x: (B, T, D) time-major-in-middle features; n_valid: (B,) frames.
    Interior frames use the linear-regression kernel k/sum(k^2); the first
    and last half-windows take the constant slope of the edge window's
    linear fit — exactly scipy's 'interp' behavior for polyorder=1.
    Padding frames (t >= n_valid) are treated as edge-replicated.
    """
    half = width // 2
    k = np.arange(-half, half + 1, dtype=np.float32)
    denom = float((k ** 2).sum())
    B, T, D = x.shape

    t_idx = jnp.arange(T)[None, :]                       # (1, T)
    last = (n_valid - 1)[:, None]                        # (B, 1)

    # Edge-replicate into padding so interior convolution near the tail is
    # well defined before we overwrite the edge bands below.  Gather-free:
    # select each row's last valid frame with a one-hot sum, then replace
    # padding frames with it.
    last_frame = jnp.sum(
        jnp.where((t_idx == last)[:, :, None], x, 0.0), axis=1, keepdims=True
    )                                                    # (B, 1, D)
    xg = jnp.where((t_idx <= last)[:, :, None], x, last_frame)

    # Interior: correlation with k/denom along time, unrolled — 9 shifted
    # adds fuse into a single VPU loop under XLA.
    xpad = jnp.pad(xg, ((0, 0), (half, half), (0, 0)), mode="edge")
    acc = jnp.zeros_like(xg)
    for j, w in enumerate(k / denom):
        acc = acc + w * jax.lax.dynamic_slice_in_dim(xpad, j, T, axis=1)
    interior = acc

    # Edge slopes: weighted sums over the first/last `width` valid frames.
    w_head = (k / denom).astype(np.float32)              # frames 0..width-1
    head_slope = jnp.einsum(
        "w,bwd->bd", jnp.asarray(w_head), xg[:, :width, :],
        precision=jax.lax.Precision.HIGHEST,
    )

    # Tail window covers t in [n-width, n-1]; weight (t - (n-1-half))/denom.
    t_f = t_idx.astype(jnp.float32)
    n_f = n_valid[:, None].astype(jnp.float32)
    in_tail = (t_f >= n_f - width) & (t_f <= n_f - 1)
    w_tail = jnp.where(in_tail, (t_f - (n_f - 1 - half)) / denom, 0.0)
    tail_slope = jnp.einsum("bt,btd->bd", w_tail, xg, precision=jax.lax.Precision.HIGHEST)

    out = interior
    out = jnp.where(t_idx[:, :, None] < half, head_slope[:, None, :], out)
    out = jnp.where(t_idx[:, :, None] > last[:, :, None] - half, tail_slope[:, None, :], out)
    # Rows shorter than the window have no well-defined tail band (the
    # window start is negative, leaving an incomplete fit); use the
    # head fit over the edge-replicated first `width` frames everywhere —
    # exactly the host fallback's whole-window line fit
    # (frontend.extract_fbank's edge-pad-then-trim path).
    short = (n_valid < width)[:, None, None]
    out = jnp.where(short, head_slope[:, None, :], out)
    return out


class DeviceFrontend:
    """Precompiled featurizer for a fixed (feature_type, sr, max_samples)."""

    def __init__(
        self,
        feature_type: str,
        sr: int = 22050,
        max_samples: int = 22050 * 10,
        use_pallas: Optional[bool] = None,
    ):
        self.feature_type = feature_type
        self.sr = sr
        self.max_samples = max_samples
        # Optional fused Pallas kernel for the fbank spectrogram stages
        # (ops/frontend_pallas.py).  Off by default: the view-matmul XLA
        # path below is ~30% faster on v5e because Mosaic's f32-HIGHEST
        # matmul emulation can't beat XLA's on this shape; the kernel is
        # kept as the building block for a fully fused frontend and is
        # parity-tested in tests/test_frontend.py.
        self.use_pallas = bool(use_pallas) and feature_type == "fbank"
        self.frame_step = int(round(FRAME_STRIDE * sr))
        if feature_type == "fbank":
            self.frame_length = int(round(FRAME_SIZE * sr))
            self.n_fft = host.FBANK_NFFT
            self.feature_size = host.FBANK_DIM
            window = np.hamming(self.frame_length)
            self._basis = jnp.asarray(
                _windowed_dft_basis(self.frame_length, self.n_fft, window)
            )
            self._mel = jnp.asarray(host.fbank_mel_matrix(sr).T.astype(np.float32))
            if self.use_pallas:
                from rnn_speech_tpu.ops import frontend_pallas

                self._kb, self._mp = frontend_pallas.pad_basis_mel(
                    self._basis, self._mel, n_fft=self.n_fft,
                    step=self.frame_step, frame_length=self.frame_length,
                )
        elif feature_type == "mfcc":
            self.n_fft = int(round(sr * FRAME_SIZE))
            self.frame_length = self.n_fft
            self.feature_size = host.MFCC_DIM
            # Centered STFT over a reflect-padded signal: frame count is
            # 1 + (n + 2*(n_fft//2) - n_fft) // hop  (n_fft may be odd).
            self._center_slack = 2 * (self.n_fft // 2) - self.n_fft
            window = np.hanning(self.n_fft + 1)[:-1]
            self._basis = jnp.asarray(
                _windowed_dft_basis(self.n_fft, self.n_fft, window)
            )
            self._mel = jnp.asarray(
                host.librosa_mel_matrix(sr, self.n_fft).T.astype(np.float32)
            )
            n_mels = self._mel.shape[1]
            # Ortho DCT-II matrix (n_mels -> MFCC_DIM).
            nmat = np.arange(n_mels)[:, None]
            kmat = np.arange(host.MFCC_DIM)[None, :]
            dct = np.cos(np.pi * (2 * nmat + 1) * kmat / (2 * n_mels)) * 2.0
            dct *= np.where(kmat == 0, np.sqrt(1.0 / (4 * n_mels)), np.sqrt(1.0 / (2 * n_mels)))
            self._dct = jnp.asarray(dct.astype(np.float32))
        else:
            raise ValueError(f"Unknown feature type {feature_type!r}")
        # Single source of truth for frame counts: _frames_for_width (the
        # per-example device-side count in num_frames_for mirrors it).
        self.max_frames = self._frames_for_width(max_samples)

    # ------------------------------------------------------------------ call

    def _frames_for_width(self, n_samples: int) -> int:
        """Static frame count for a signal buffer of width n_samples.

        The featurizer is shape-polymorphic: bucketed input pipelines feed
        shorter-than-max buffers and every derived shape follows the buffer
        width, so one DeviceFrontend serves all buckets (one XLA
        compilation per distinct width)."""
        if self.feature_type == "fbank":
            return int(np.ceil(abs(n_samples - self.frame_length) / self.frame_step))
        return 1 + (n_samples + self._center_slack) // self.frame_step

    def _frame(self, padded: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        """Overlapping frames (B, n_frames, frame_length) without a gather.

        frames[t, l] = padded[t*step + l].  Writing l = k*step + r with
        r < step turns framing into K = ceil(len/step) shifted views of the
        signal reshaped to non-overlapping (N, step) rows — pure reshapes
        and static slices.  The obvious fancy-index gather of ~36M elements
        costs ~0.5 s on real TPUs (lane-axis gathers serialize); this form
        is free.
        """
        B = padded.shape[0]
        step, length = self.frame_step, self.frame_length
        K = -(-length // step)
        rows = n_frames + K
        need = rows * step
        if padded.shape[1] < need:
            padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        view = padded[:, :need].reshape(B, rows, step)
        pieces = [view[:, k : k + n_frames, :] for k in range(K)]
        return jnp.concatenate(pieces, axis=-1)[:, :, :length]

    def num_frames_for(
        self, n_samples: jnp.ndarray, limit: Optional[int] = None
    ) -> jnp.ndarray:
        """Per-example valid frame count (same formulas as the host path)."""
        if self.feature_type == "fbank":
            nf = jnp.ceil(
                jnp.abs(n_samples - self.frame_length) / self.frame_step
            ).astype(jnp.int32)
        else:
            nf = 1 + (n_samples + self._center_slack) // self.frame_step
        # Zero-length (batch padding) entries yield zero frames — the host
        # formula's abs() would otherwise report phantom frames for them.
        nf = jnp.where(n_samples <= 0, 0, nf)
        return jnp.clip(nf, 0, self.max_frames if limit is None else limit)

    def __call__(
        self, signals: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """signals f32[B, n <= max_samples], lengths i32[B] -> (feats, frames)."""
        if self.feature_type == "fbank":
            return self._fbank(signals, lengths)
        return self._mfcc(signals, lengths)

    def _fbank(self, signals, lengths):
        # optimization_barrier between stages is load-bearing: letting XLA
        # fuse framing/einsum/log/delta stages together produces a ~270x
        # slower program on real TPUs (measured 1576 ms -> 5.8 ms for a
        # batch of 64 ten-second clips with barriers, identical values).
        bar = jax.lax.optimization_barrier
        B, n_samples = signals.shape
        n_frames = self._frames_for_width(n_samples)
        # Zero out padding samples so frames past the tail contribute nothing.
        s_idx = jnp.arange(n_samples)[None, :]
        signals = jnp.where(s_idx < lengths[:, None], signals, 0.0)

        # Pre-emphasis (first sample kept as-is).
        pre = jnp.concatenate(
            [signals[:, :1], signals[:, 1:] - 0.97 * signals[:, :-1]], axis=1
        )

        if self.use_pallas:
            from rnn_speech_tpu.ops import frontend_pallas

            banks = bar(frontend_pallas.fbank_banks_pallas(
                pre, self._kb, self._mp,
                step=self.frame_step, n_frames=n_frames,
                n_fft=self.n_fft, n_mels=self._mel.shape[1],
            ))
        else:
            # Windowed DFT without materializing the (B, T, frame_len)
            # framed signal (~270 MB for a 128 x 10 s batch): with the
            # signal viewed as non-overlapping (rows, step) windows, frame
            # t is rows t..t+K-1, so  spec = sum_k view[:, k:k+T] @
            # basis[k*step:(k+1)*step]  — K shifted views of one reshape
            # feeding K matmuls.  Exact same products as the framed einsum,
            # reassociated; ~1.4x faster end to end on v5e.
            step, length = self.frame_step, self.frame_length
            K = -(-length // step)
            rows = n_frames + K
            need = rows * step
            if pre.shape[1] < need:
                pre = jnp.pad(pre, ((0, 0), (0, need - pre.shape[1])))
            view = pre[:, :need].reshape(B, rows, step)
            spec = None
            for k in range(K):
                hi = min((k + 1) * step, length)
                piece = self._basis[k * step : hi]          # (<=step, 2*bins)
                part = jnp.einsum(
                    "btl,lf->btf", view[:, k : k + n_frames, : hi - k * step],
                    piece, precision=jax.lax.Precision.HIGHEST,
                )
                spec = part if spec is None else spec + part
            spec = bar(spec)
            bins = self.n_fft // 2 + 1
            power = (spec[..., :bins] ** 2 + spec[..., bins:] ** 2) / self.n_fft

            banks = jnp.einsum("btf,fm->btm", power, self._mel, precision=jax.lax.Precision.HIGHEST)  # (B, T, nfilt)
            banks = jnp.where(banks == 0.0, np.finfo(np.float64).eps, banks)
            banks = bar(10.0 * jnp.log10(banks))

        nf = self.num_frames_for(lengths, limit=n_frames)
        t_idx = jnp.arange(n_frames)[None, :]
        valid = (t_idx < nf[:, None])[:, :, None]            # (B, T, 1)
        mean = jnp.sum(jnp.where(valid, banks, 0.0), axis=1, keepdims=True) / (
            jnp.maximum(nf, 1)[:, None, None].astype(banks.dtype)
        )
        banks = bar(banks - (mean + 1e-8))

        d1 = bar(_savgol_delta(banks, nf))
        d2 = bar(_savgol_delta(d1, nf))
        feats = jnp.concatenate([banks, d1, d2], axis=-1)
        feats = jnp.where(valid, feats, 0.0)
        return feats.astype(jnp.float32), nf

    def _mfcc(self, signals, lengths):
        bar = jax.lax.optimization_barrier  # see _fbank: blocks a 270x fusion
        B, n_samples = signals.shape
        n_frames = self._frames_for_width(n_samples)
        s_idx = jnp.arange(n_samples)[None, :]
        signals = jnp.where(s_idx < lengths[:, None], signals, 0.0)

        # Reflect-pad by n_fft//2 on both sides (librosa center=True).  The
        # right-hand reflection must mirror around each clip's *true* end:
        # per-example dynamic slices/updates (cheap on TPU) instead of a
        # 14M-element gather (~150 ms at these shapes).
        pad = self.n_fft // 2
        left = signals[:, 1 : pad + 1][:, ::-1]
        # tail[k] = signals[L-2-k]: the reversed slice signals[L-1-pad:L-1].
        starts = jnp.clip(lengths - 1 - pad, 0, n_samples - pad)
        tail = jax.vmap(
            lambda sig, st: jax.lax.dynamic_slice(sig, (st,), (pad,))
        )(signals, starts)[:, ::-1]
        # Host parity for degenerate clips: the numpy reference constant-pads
        # (zeros) when len(sig) <= pad because reflection is undefined there
        # (frontend.py extract_mfcc); mirror that per row instead of
        # reflecting zero-masked padding into the frames.
        short = (lengths <= pad)[:, None]
        left = jnp.where(short, 0.0, left)
        tail = jnp.where(short, 0.0, tail)
        base_arr = jnp.concatenate(
            [left, signals, jnp.zeros((B, pad), signals.dtype)], axis=1
        )
        gathered = jax.vmap(
            lambda arr, t, pos: jax.lax.dynamic_update_slice(arr, t, (pos,))
        )(base_arr, tail, pad + lengths)

        frames = bar(self._frame(bar(gathered), n_frames))
        spec = bar(jnp.einsum("btl,lf->btf", frames, self._basis, precision=jax.lax.Precision.HIGHEST))
        bins = self.n_fft // 2 + 1
        power = spec[..., :bins] ** 2 + spec[..., bins:] ** 2

        mel = jnp.einsum("btf,fm->btm", power, self._mel, precision=jax.lax.Precision.HIGHEST)
        db = bar(10.0 * jnp.log10(jnp.maximum(mel, 1e-10)))

        nf = self.num_frames_for(lengths, limit=n_frames)
        t_idx = jnp.arange(n_frames)[None, :]
        valid = (t_idx < nf[:, None])[:, :, None]
        peak = jnp.max(jnp.where(valid, db, -jnp.inf), axis=(1, 2), keepdims=True)
        db = jnp.maximum(db, peak - 80.0)

        coefs = jnp.einsum("btm,mk->btk", db, self._dct, precision=jax.lax.Precision.HIGHEST)
        coefs = jnp.where(valid, coefs, 0.0)
        return coefs.astype(jnp.float32), nf


@functools.partial(jax.jit, static_argnums=(0,))
def featurize(fe: DeviceFrontend, signals, lengths):
    """jit entry point; `fe` is static (hashable by id)."""
    return fe(signals, lengths)
