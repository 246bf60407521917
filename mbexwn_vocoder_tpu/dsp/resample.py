"""Polyphase FIR resampling with Kaiser-designed anti-aliasing filter.

reference: MBExWN_NVoc/sig_proc/resample.py:7-64 (same Kaiser design rule,
same radius cap / stop-band back-off loop).  Host-side utility used by the
CLI frontends and wavetable initialisation.
"""
from __future__ import annotations

import math

import numpy as np
import scipy.signal as ss


def kaiser_beta_for_attenuation(stop_att: float) -> float:
    """Standard Kaiser-window beta for a given stop-band attenuation in dB."""
    if stop_att >= 50:
        return 0.1102 * (stop_att - 8.7)
    if stop_att >= 21:
        return 0.5842 * pow(stop_att - 21.0, 0.4) + 0.07886 * (stop_att - 21.0)
    return 0.0


def resample(x, in_sr, out_sr, stop_att=70, axis=0, trans_width_normed=0.1, fir_filt=None):
    """Resample x from in_sr to out_sr; returns (resampled, fir_filter)."""
    in_sr = int(in_sr)
    out_sr = int(out_sr)
    gcd = math.gcd(in_sr, out_sr)
    up = out_sr // gcd
    down = in_sr // gcd

    if fir_filt is None:
        m_beta = kaiser_beta_for_attenuation(stop_att)
        m_trans_width = 2 * np.pi * np.fmin(1.0, out_sr / in_sr) * trans_width_normed

        # cap the filter radius; if it would exceed 8000 taps, trade stop-band
        # attenuation for length (same rule as the reference)
        while True:
            m_radius = int(np.ceil((stop_att - 8.0) / 2.285 / m_trans_width / 2))
            if (2 * m_radius > 8000) and stop_att > 10:
                stop_att -= 6
                m_beta = kaiser_beta_for_attenuation(stop_att)
            else:
                break

        winlen = m_radius * 2 + 1
        filt_dtype = x.dtype if x.dtype == np.float32 else np.float64
        fir_filt = ss.firwin(
            winlen * up,
            cutoff=(1 - trans_width_normed) / max(up, down),
            window=("kaiser", m_beta),
        ).astype(filt_dtype, copy=False)
    return ss.resample_poly(x, up, down, axis=axis, window=fir_filt), fir_filt
