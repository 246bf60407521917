"""Golden-value tests for the DSP core against the reference implementation
and independent third-party oracles."""
import numpy as np
import pytest

from mbexwn_vocoder_tpu.dsp import windows as W
from mbexwn_vocoder_tpu.dsp import mel as M
from mbexwn_vocoder_tpu.dsp import stft as S
from mbexwn_vocoder_tpu.dsp import glottis as G
from mbexwn_vocoder_tpu.dsp import pqmf as P
from mbexwn_vocoder_tpu.dsp import wavetable as WT
from mbexwn_vocoder_tpu.dsp.resample import resample

from .reference_oracle import require_reference


ALL_WIN_TYPES = [
    "hanning", "hann", "hamming", "exactblackman", "blackman",
    "blackmanharris_3_1", "blackmanharris_3_2", "blackmanharris_4_1",
    "blackmanharris_4_2", "hanning2", "nuttall3_30db", "nuttall3_18db",
    "nuttall4_6db", "nuttall4_30db", "nuttall4_42db", "triang", "bartlett",
    "mhanning", "rect",
]


@pytest.mark.parametrize("win_type", ALL_WIN_TYPES)
@pytest.mark.parametrize("winlen", [64, 65, 1200])
def test_windows_match_reference(win_type, winlen):
    require_reference()
    from MBExWN_NVoc.sig_proc.Mwindows import window as ref_window

    ours = W.window(win_type, winlen)
    ref = ref_window(win_type, winlen)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("winlen,para", [(63, 5.0), (128, 9.0)])
def test_kaiser_gauss_windows(winlen, para):
    require_reference()
    import scipy.signal as ss

    ours = W.window("kaiser", winlen, para=para)
    # scipy kaiser as an independent oracle
    np.testing.assert_allclose(ours, ss.windows.kaiser(winlen, para), rtol=1e-10, atol=1e-12)

    g = W.window("gauss", winlen, para=para)
    assert g.shape == (winlen,)
    assert np.all(g > 0) and np.max(g) <= 1.0


def test_mel_filter_against_transformers():
    """Independent slaney-mel oracle: transformers.audio_utils."""
    from transformers.audio_utils import mel_filter_bank

    sr, n_fft, n_mels, fmin, fmax = 24000, 2048, 80, 0.0, 12000.0
    ours = M.mel_filter(sr, n_fft, n_mels, fmin, fmax)
    theirs = mel_filter_bank(
        num_frequency_bins=1 + n_fft // 2,
        num_mel_filters=n_mels,
        min_frequency=fmin,
        max_frequency=fmax,
        sampling_rate=sr,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (freq_bins, n_mels)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-8)


def test_mel_scale_roundtrip():
    f = np.linspace(10.0, 11000.0, 301)
    np.testing.assert_allclose(M.mel_to_hz(M.hz_to_mel(f)), f, rtol=1e-10)
    # slaney breakpoints: 1000 Hz maps to mel 15
    assert abs(M.hz_to_mel(1000.0) - 15.0) < 1e-12


def test_calc_stft_matches_reference():
    require_reference()
    from MBExWN_NVoc.sig_proc.spec.stft import calc_stft as ref_calc_stft

    # the shipped reference module lacks its _get_cplx_dtype helper (dead on
    # the complex path); supply it so the oracle can run in complex mode
    import MBExWN_NVoc.sig_proc.spec.stft as ref_stft_mod

    if not hasattr(ref_stft_mod, "_get_cplx_dtype"):
        ref_stft_mod._get_cplx_dtype = lambda dt: np.result_type(dt, np.complex64)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5000).astype(np.float32)
    for center in (True, False):
        for do_mag in (True, False):
            ours = S.calc_stft(x, win_len=400, hop_len=100, fft_size=512, center=center,
                               do_mag=do_mag, dtype=np.float32)
            ref = ref_calc_stft(x, win_len=400, hop_len=100, fft_size=512, center=center,
                                do_mag=do_mag, dtype=np.float32)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("oq,am,ta", [(0.5, 0.7, 0.05), (0.4, 0.8, 0.0), (0.6, 0.65, 0.3),
                                      (0.9995, 0.7, 0.0004), (0.5, 0.7, 0.497)])
def test_lf_synth_params_match_reference(oq, am, ta):
    require_reference()
    from MBExWN_NVoc.glottis.FglotLFsynthparams import FglotLFsynthparams as ref_params

    a1, e1, t1 = G.lf_synth_params(oq, am, ta)
    a2, e2, t2 = ref_params(oq, am, ta)
    np.testing.assert_allclose([a1, e1, t1], [a2, e2, t2], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("oq,am,ta,deriv", [(0.5, 0.7, 0.05, True), (0.5, 0.7, 0.05, False),
                                            (0.4, 0.8, 0.0, True), (0.6, 0.66, 0.2, False)])
def test_lf_pulse_spectrum_matches_reference(oq, am, ta, deriv):
    require_reference()
    from MBExWN_NVoc.glottis.FglotspecLF import FglotspecLF as ref_spec

    f = np.arange(257) * 480.0 / 512.0
    ours = G.lf_pulse_spectrum(f, oq=oq, am=am, ta=ta, get_derivative=deriv, orig=0)[0]
    ref = ref_spec(f, oq=oq, am=am, ta=ta, get_derivative=deriv, orig=0)[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_pqmf_filters_match_reference():
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf_preprocess import _design_prototype_filter

    proto_ref = _design_prototype_filter(62, 0.142, 9.0)
    proto_ours = P.design_prototype_filter(62, 0.142, 9.0)
    np.testing.assert_allclose(proto_ours, proto_ref, rtol=1e-10, atol=1e-12)

    # analysis/synthesis bank parity vs the reference layer's numpy design
    from MBExWN_NVoc.vocoder.model.tf_preprocess import TFPQMF

    ref_layer = TFPQMF(subbands=4, taps=62, cutoff_ratio=0.142, beta=9.0)
    ana, syn = P.pqmf_filters(4, 62, 0.142, 9.0)
    np.testing.assert_allclose(ana, ref_layer.analysis_filter, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(syn, ref_layer.synthesis_filter, rtol=1e-6, atol=1e-7)


def test_pqmf_near_perfect_reconstruction():
    """Analysis->synthesis through the numpy filters reconstructs a delayed
    copy of the input (the PQMF perfect-reconstruction property)."""
    import scipy.signal as ss

    subbands, taps = 4, 62
    ana, syn = P.pqmf_filters(subbands, taps, 0.142, 9.0)
    rng = np.random.RandomState(1)
    x = rng.randn(4096).astype(np.float64)

    # analysis: filter then decimate
    bands = []
    for k in range(subbands):
        y = np.convolve(x, ana[:, 0, k])[taps // 2 : taps // 2 + x.size]
        bands.append(y[::subbands])
    # synthesis: upsample (zero-stuff) then filter and sum
    rec = np.zeros_like(x)
    for k in range(subbands):
        up = np.zeros(x.size)
        up[::subbands] = bands[k] * subbands
        rec += np.convolve(up, syn[:, k, 0])[taps // 2 : taps // 2 + x.size]

    # find the net system delay empirically (depends on decimation phase),
    # then check relative reconstruction error away from the edges
    corr = np.correlate(rec, x, mode="full")
    d = int(np.argmax(np.abs(corr))) - (x.size - 1)
    assert abs(d) <= taps
    lo, hi = 2 * taps, x.size - 2 * taps
    err = rec[lo + d : hi + d] - x[lo:hi]
    rel = np.sqrt(np.mean(err**2) / np.mean(x**2))
    assert rel < 0.02, (rel, d)


def test_lf_pulse_matches_reference_get_LFpulse():
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf_wavetable import get_LFpulse

    ours = WT.lf_pulse(480, oq=0.5, am=0.8, rta=0.05, pul_bw=0.2, quiet=True)
    ref = get_LFpulse(480, oq=0.5, am=0.8, rta=0.05, pul_bw=0.2, quiet=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-9)


def test_wavetable_grid_matches_reference():
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf_wavetable import PulseWaveTable

    spec = WT.build_wavetable_grid(
        sample_rate=12000, nominalF0=50.0, maxF0=650.0, F0GridFactor=1.25,
        wt_oversampling=2, Oq=0.5, am=0.8, rta=0.05, quiet=True,
    )
    # trainable=False (not None) because modern tf_keras rejects None; the
    # wavetable values are identical either way
    ref = PulseWaveTable(
        sample_rate=12000, nominalF0=50.0, maxF0=650.0, F0GridFactor=1.25,
        wt_oversampling=2, Oq=0.5, am=0.8, rta=0.05, quiet=True, trainable=False,
    )
    ref_tables = ref.wavetables.numpy() if hasattr(ref.wavetables, "numpy") else np.asarray(ref.wavetables)
    assert spec.wavetables.shape == ref_tables.shape
    np.testing.assert_allclose(spec.wavetables, ref_tables, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(spec.F0_list, ref.F0_list, rtol=1e-9)
    assert abs(spec.nominalF0 - ref.nominalF0) < 1e-9


def test_resample_matches_reference():
    require_reference()
    from MBExWN_NVoc.sig_proc.resample import resample as ref_resample

    rng = np.random.RandomState(2)
    x = rng.randn(48000).astype(np.float32)
    ours, _ = resample(x, 44100, 24000)
    ref, _ = ref_resample(x, 44100, 24000)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_norm_mell_matches_reference():
    """Offline mel/sound RMS normalisation with OLA gain smoothing
    (preprocess.py:129-378 numpy path)."""
    require_reference()
    from MBExWN_NVoc.vocoder.model.preprocess import norm_mell as ref_norm_mell

    from mbexwn_vocoder_tpu.analysis import norm_mell

    pc = {"sample_rate": 24000, "hop_size": 300, "win_size": 1200, "fft_size": 2048,
          "mel_channels": 80, "fmin": 0.0, "fmax": 12000.0}
    rng = np.random.RandomState(0)
    T = 40
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    snd = (rng.randn(1, T * 300) * 0.1).astype(np.float32)

    for use_pinv in (False, True):
        for iters in (1, 2):
            ours = norm_mell(mell.copy(), pc, snd=snd.copy(), num_smooth_iters=iters, use_pinv=use_pinv)
            ref = ref_norm_mell(mell.copy(), pc, snd=snd.copy(), num_smooth_iters=iters, use_pinv=use_pinv)
            np.testing.assert_allclose(ours[0], ref[0], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(ours[1], ref[1], rtol=1e-4, atol=1e-4)


def test_db_helpers():
    from mbexwn_vocoder_tpu.dsp.db import db2lin, lin2db

    np.testing.assert_allclose(lin2db(np.array([1.0, 10.0])), [0.0, 20.0])
    np.testing.assert_allclose(lin2db(np.array([-1.0])), [0.0])  # abs by default
    np.testing.assert_allclose(lin2db(np.array([1e-9]), minthresh=1e-3), [-60.0])
    np.testing.assert_allclose(db2lin(np.array([20.0, -20.0])), [10.0, 0.1])


def test_hann_periodic_matches_tf():
    require_reference()
    import tensorflow as tf

    from mbexwn_vocoder_tpu.dsp.windows import hann_periodic

    for n in (300, 1200):
        ours = hann_periodic(n)
        ref = tf.signal.hann_window(n, periodic=True).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_istft_roundtrip_exact():
    """calc_istft is the exact LSE inverse of calc_stft for consistent spectra."""
    from mbexwn_vocoder_tpu.dsp.stft import calc_istft, calc_stft

    x = np.random.RandomState(0).randn(2, 4800).astype(np.float32)
    S = calc_stft(x, win_len=1200, hop_len=300, fft_size=2048, do_mag=False)
    y = calc_istft(S, win_len=1200, hop_len=300, fft_size=2048, length=4800)
    np.testing.assert_allclose(y, x, atol=2e-6)


def test_band_limit_analysis_path():
    """compute_mel_spectrogram_internal band_limit: (low, high, stop) filter,
    resynthesized sound returned; mel from the unfiltered magnitude by default
    (reference preprocess.py:493-545)."""
    from mbexwn_vocoder_tpu.analysis import compute_mel_spectrogram_internal

    pc = {"sample_rate": 24000, "fft_size": 2048, "win_size": 1200, "hop_size": 300,
          "mel_channels": 80, "fmin": 0.0, "fmax": 12000.0}
    rng = np.random.RandomState(1)
    snd = rng.randn(1, 24000).astype(np.float32) * 0.1

    mel_plain, sr_plain = compute_mel_spectrogram_internal(snd, pc, do_post=False)
    out = compute_mel_spectrogram_internal(snd, pc, band_limit=(100.0, 8000.0, 10000.0),
                                           do_post=False)
    mel_bl = out[0]
    # default: mel computed from the UNFILTERED magnitude -> identical
    np.testing.assert_allclose(mel_bl, mel_plain, atol=1e-5)

    # the filtered, resynthesized sound has the stop band removed
    pc2 = dict(pc, norm_mel={"num_smooth_iters": 1})
    mel2, sr2, snd_out = compute_mel_spectrogram_internal(
        snd, pc2, band_limit=(100.0, 8000.0, 10000.0))
    spec_in = np.abs(np.fft.rfft(snd[0]))
    spec_out = np.abs(np.fft.rfft(np.asarray(snd_out)[0] * np.std(snd) / (np.std(snd_out) + 1e-12)))
    freqs = np.fft.rfftfreq(24000, 1 / 24000.0)
    hi_in = spec_in[freqs > 10500].mean()
    hi_out = spec_out[freqs > 10500].mean()
    assert hi_out < 0.05 * hi_in, (hi_out, hi_in)

    # return_band_limited_mel: mel now reflects the filtered magnitude
    out_bl = compute_mel_spectrogram_internal(snd, pc, band_limit=(100.0, 8000.0, 10000.0),
                                              do_post=False, return_band_limited_mel=True)
    assert not np.allclose(out_bl[0], mel_plain, atol=1e-3)


def test_mel_lin_interpol_params():
    """get_mel_lin_interpol_params matches the reference implementation
    (preprocess.py:381-414) exactly, including its extended-grid spacing
    quirk (dmel over n_mels-1)."""
    require_reference()
    from MBExWN_NVoc.vocoder.model.preprocess import (
        get_mel_lin_interpol_params as ref_fn,
    )

    from mbexwn_vocoder_tpu.analysis import get_mel_lin_interpol_params

    pc = {"sample_rate": 24000, "fft_size": 2048, "mel_channels": 80,
          "fmin": 0.0, "fmax": 12000.0}
    gain_fac, mi, lo, hi = get_mel_lin_interpol_params(pc, 2048)
    ref_gain, ref_mi, ref_lo, ref_hi = ref_fn(pc, 2048)
    assert (lo, hi) == (ref_lo, ref_hi)
    np.testing.assert_allclose(gain_fac, ref_gain, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(mi, ref_mi, rtol=1e-4, atol=1e-7)


def test_differentiable_prototype_filter():
    """JAX trainable-cutoff prototype (reference tf_preprocess.py:56-65):
    matches the numpy design at the same cutoff and is differentiable."""
    import jax
    import jax.numpy as jnp

    from mbexwn_vocoder_tpu.dsp.pqmf import (
        design_prototype_filter,
        design_prototype_filter_differentiable,
    )

    h_np = design_prototype_filter(62, 0.15, 9.0)
    h_jx = np.asarray(design_prototype_filter_differentiable(jnp.float32(0.15), 62, 9.0))
    np.testing.assert_allclose(h_jx, h_np, rtol=2e-5, atol=1e-7)

    g = jax.grad(lambda c: jnp.sum(design_prototype_filter_differentiable(c, 62, 9.0) ** 2))(
        jnp.float32(0.15)
    )
    assert np.isfinite(float(g)) and abs(float(g)) > 0
