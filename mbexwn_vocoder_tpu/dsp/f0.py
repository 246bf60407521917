"""F0 estimation for training targets (host-side NumPy).

The reference consumes externally produced F0 contours in its training tuple
(wavegen_1d.py:466-481) without shipping an extractor; this provides one so
the training pipeline is self-contained.  Method: YIN-style cumulative-mean
normalized difference over autocorrelation (de Cheveigne & Kawahara 2002)
with parabolic interpolation and an aperiodicity-based voicing decision
(F0=0 on unvoiced frames, matching the reference's mask conventions,
custom_pulsed_generator.py:528-552).
"""
from __future__ import annotations

import numpy as np


def estimate_f0(
    x: np.ndarray,
    sample_rate: float,
    hop: int,
    fmin: float = 50.0,
    fmax: float = 600.0,
    frame_len: int | None = None,
    threshold: float = 0.15,
) -> np.ndarray:
    """x: (T,) audio -> (T//hop + 1,) F0 in Hz (0 where unvoiced)."""
    x = np.asarray(x, dtype=np.float64)
    tau_min = max(2, int(sample_rate / fmax))
    tau_max = int(sample_rate / fmin)
    if frame_len is None:
        frame_len = 2 * tau_max
    n_frames = x.shape[-1] // hop + 1
    xp = np.pad(x, (frame_len // 2, frame_len + tau_max))

    f0 = np.zeros(n_frames)
    for i in range(n_frames):
        start = i * hop
        frame = xp[start : start + frame_len + tau_max]
        w = frame[:frame_len]
        # difference function via autocorrelation:
        # d(tau) = r(0) + r_tau(0) - 2*corr(tau)
        cumsum_sq = np.concatenate(([0.0], np.cumsum(frame**2)))
        r0 = cumsum_sq[frame_len]
        if r0 < 1e-8:  # silence -> unvoiced
            continue
        corr = np.correlate(frame, w, mode="valid")[: tau_max + 1]
        r_tau = cumsum_sq[np.arange(tau_max + 1) + frame_len] - cumsum_sq[np.arange(tau_max + 1)]
        d = r0 + r_tau - 2 * corr
        # cumulative-mean normalisation
        dprime = np.ones(tau_max + 1)
        csum = np.cumsum(d[1:])
        with np.errstate(divide="ignore", invalid="ignore"):
            dprime[1:] = d[1:] * np.arange(1, tau_max + 1) / np.where(csum > 0, csum, 1e-12)

        seg = dprime[tau_min : tau_max + 1]
        below = np.flatnonzero(seg < threshold)
        if below.size:
            # first local minimum below threshold
            tau = below[0] + tau_min
            while tau + 1 <= tau_max and dprime[tau + 1] < dprime[tau]:
                tau += 1
        else:
            tau = int(np.argmin(seg)) + tau_min
            if seg.min() > 0.5:  # clearly aperiodic
                continue
        # parabolic interpolation around the minimum
        if 1 <= tau < tau_max:
            a, b, c = dprime[tau - 1], dprime[tau], dprime[tau + 1]
            denom = a - 2 * b + c
            delta = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            delta = np.clip(delta, -0.5, 0.5)
        else:
            delta = 0.0
        f0[i] = sample_rate / (tau + delta)
    return f0.astype(np.float32)


def upsample_f0(f0_frames: np.ndarray, hop: int, total_len: int) -> np.ndarray:
    """Frame-rate F0 -> sample-rate contour by linear interpolation, keeping
    hard voiced/unvoiced edges (no interpolation across 0 boundaries)."""
    n = f0_frames.shape[-1]
    t_frames = np.arange(n) * hop
    t = np.arange(total_len)
    up = np.interp(t, t_frames, f0_frames)
    # zero out samples whose neighbouring frames disagree about voicing
    voiced = f0_frames > 0
    vo = np.interp(t, t_frames, voiced.astype(np.float64))
    up = np.where(vo >= 0.999, up, 0.0)
    return up.astype(np.float32)
