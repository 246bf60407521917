"""On-device STFT / iSTFT with tf.signal-compatible semantics.

The excitation -> spectral-envelope filter -> overlap-add resynthesis path of
the vocoder (custom_pulsed_generator.py:681-724) depends on the exact framing,
windowing and OLA-normalisation conventions of tf.signal.stft /
tf.signal.inverse_stft / inverse_stft_window_fn; these are reproduced here
sample-exactly (off-by-one hops are audible as buzz).

TPU notes: framing is ceil(L/S) static strided slices (no gather), OLA is
pad+add passes (no scatter), and the real DFTs default to explicit cos/sin
matmuls on the MXU (see rdft/irdft; MBEXWN_STFT_METHOD selects the XLA FFT
instead).
"""
from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .precision import sensitive_matmul_precision

# rDFT evaluation method for the on-device transforms:
#   "fft"    -> jnp.fft.rfft/irfft (XLA's FFT lowering)
#   "matmul" -> explicit real-DFT matmuls (rides the MXU; the transform sizes
#               here -- frame_length ~1200, fft 2048 -- are small enough that
#               two (L, K) matmuls beat the FFT butterfly on TPU)
# Both paths are numerically interchangeable at fp32 tolerance and share the
# same tests; select via env MBEXWN_STFT_METHOD.
STFT_METHOD = os.environ.get("MBEXWN_STFT_METHOD", "matmul")


@lru_cache(maxsize=16)
def _rdft_matrices(n_in: int, fft_length: int):
    """cos/sin matrices (n_in, K) evaluating rfft(x, fft_length)[:K] for a
    real input of length n_in <= fft_length (implicit zero padding)."""
    K = fft_length // 2 + 1
    n = np.arange(n_in)[:, None]
    k = np.arange(K)[None, :]
    ang = 2.0 * np.pi * n * k / fft_length
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=16)
def _irdft_matrices(fft_length: int, n_out: int):
    """Real/imag matrices (K, n_out) evaluating irfft(X, fft_length)[:n_out]."""
    K = fft_length // 2 + 1
    k = np.arange(K)[:, None]
    n = np.arange(n_out)[None, :]
    ang = 2.0 * np.pi * k * n / fft_length
    scale = np.full((K, 1), 2.0 / fft_length)
    scale[0] = 1.0 / fft_length
    if fft_length % 2 == 0:
        scale[-1] = 1.0 / fft_length
    cr = (np.cos(ang) * scale).astype(np.float32)
    ci = (-np.sin(ang) * scale).astype(np.float32)
    return cr, ci


def rdft(frames: jnp.ndarray, fft_length: int, method: Optional[str] = None) -> jnp.ndarray:
    """rfft over the last axis with implicit zero-pad to fft_length."""
    method = method or STFT_METHOD
    if method == "fft":
        return jnp.fft.rfft(frames, n=fft_length, axis=-1)
    # TPU note: HIGHEST keeps the twiddle matmuls true fp32 (DEFAULT would
    # truncate the operands to bf16 on the MXU — see ops/precision.py)
    prec = sensitive_matmul_precision()
    C, S = _rdft_matrices(frames.shape[-1], fft_length)
    re = jnp.matmul(frames, jnp.asarray(C), precision=prec)
    im = -jnp.matmul(frames, jnp.asarray(S), precision=prec)
    return jax.lax.complex(re, im)


def irdft(spec: jnp.ndarray, fft_length: int, n_out: int, method: Optional[str] = None) -> jnp.ndarray:
    """First n_out samples of irfft(spec, fft_length) over the last axis."""
    method = method or STFT_METHOD
    if method == "fft":
        return jnp.fft.irfft(spec, n=fft_length, axis=-1)[..., :n_out]
    prec = sensitive_matmul_precision()
    Cr, Ci = _irdft_matrices(fft_length, n_out)
    return (jnp.matmul(jnp.real(spec), jnp.asarray(Cr), precision=prec)
            + jnp.matmul(jnp.imag(spec), jnp.asarray(Ci), precision=prec))



def frame(x: jnp.ndarray, frame_length: int, frame_step: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length); n_frames = 1+(T-L)//S.

    TPU note: implemented as ceil(L/S) static strided slices of a
    (rows, S)-reshaped signal instead of an index-matrix gather -- large
    gathers are pathologically slow to compile on the TPU backend, while
    slices+concat compile instantly and fuse.
    """
    L, S = frame_length, frame_step
    T = x.shape[-1]
    n_frames = 1 + (T - L) // S
    m = -(-L // S)  # slices per frame
    rows_needed = n_frames - 1 + m
    pad = rows_needed * S - T
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    elif pad < 0:
        x = x[..., : rows_needed * S]
    x2 = x.reshape(x.shape[:-1] + (rows_needed, S))
    # frame k = rows k..k+m-1 concatenated, truncated to L
    blocks = [x2[..., j : j + n_frames, :] for j in range(m)]
    frames = jnp.concatenate(blocks, axis=-1)
    return frames[..., :L]


def stft(
    x: jnp.ndarray,
    frame_length: int,
    frame_step: int,
    fft_length: int,
    window: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """tf.signal.stft(pad_end=False) semantics: frames start at 0, windowed
    frames are right-padded with zeros to fft_length before the rfft."""
    frames = frame(x, frame_length, frame_step)
    if window is not None:
        frames = frames * window
    return rdft(frames, fft_length)


def inverse_stft_window(
    frame_length: int,
    frame_step: int,
    forward_window: np.ndarray,
) -> np.ndarray:
    """tf.signal.inverse_stft_window_fn: forward window divided by the
    periodized sum of its squares over all frame_step shifts."""
    window = np.asarray(forward_window, dtype=np.float64)
    denom = window**2
    overlaps = -(-frame_length // frame_step)  # ceil
    denom = np.pad(denom, (0, overlaps * frame_step - frame_length))
    denom = denom.reshape(overlaps, frame_step)
    denom = denom.sum(axis=0)
    denom = np.tile(denom, overlaps)[:frame_length]
    return (window / denom).astype(np.float32)


def overlap_and_add(frames: jnp.ndarray, frame_step: int) -> jnp.ndarray:
    """(..., F, L) -> (..., (F-1)*S + L) by overlap-add.

    TPU note: expressed as ceil(L/S) pad+add passes over a (rows, S) grid
    instead of a scatter-add (scatters are slow to compile/run on TPU;
    pads and adds fuse).
    """
    F, L = frames.shape[-2], frames.shape[-1]
    S = frame_step
    m = -(-L // S)
    pad_cols = m * S - L
    if pad_cols:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 2) + [(0, 0), (0, pad_cols)])
    blocks = frames.reshape(frames.shape[:-1] + (m, S))
    out_rows = F - 1 + m
    lead = frames.ndim - 2
    acc = None
    for j in range(m):
        piece = jnp.pad(blocks[..., :, j, :], [(0, 0)] * lead + [(j, out_rows - F - j), (0, 0)])
        acc = piece if acc is None else acc + piece
    out = acc.reshape(acc.shape[:-2] + (out_rows * S,))
    return out[..., : (F - 1) * S + L]


def istft(
    spec: jnp.ndarray,
    frame_length: int,
    frame_step: int,
    fft_length: int,
    window: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """tf.signal.inverse_stft semantics: irfft to fft_length, truncate to
    frame_length, multiply by `window` (typically inverse_stft_window), OLA."""
    frames = irdft(spec, fft_length, frame_length)
    if window is not None:
        frames = frames * window
    return overlap_and_add(frames, frame_step)
