"""Training losses: multi-resolution STFT bank, NPOW, mel reconstruction,
F0 prediction with voiced/unvoiced mask dilation, STFT-coherence.

reference: MBExWN_NVoc/vocoder/model/wavegen_1d.py:32-318
(SpectLossComponents), tf_preprocess.py:248-397 (TFSpectProcessor),
custom_pulsed_generator.py:528-613 (F0 losses) and :725-739 (coherence).
"""
from __future__ import annotations

import copy
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import mel_filter
from ..dsp.utils import nextpow2_val
from ..dsp.windows import get_stft_window, window as make_window
from ..ops.stft_ops import stft

# loss_type bitmask (wavegen_1d.py:33-40); only the bits with live
# implementations upstream are active here, the rest are accepted and ignored
# like the reference's leftover trial losses
SPECT_LOSS_BIT = 1
MCCTP_LOSS_BIT = 2
MODSPEC_LOSS_BIT = 4
MCCT_LOSS_BIT = 8
NLL_LOSS_BIT = 16
NPOW_LOSS_BIT = 32
PP_LOSS_BIT = 64
BC_LOSS_BIT = 128

_EPS = 1e-7


class MultiResStft:
    """Multi-resolution STFT bank (TFSpectProcessor equivalent).

    win/hop sizes are given in seconds; fft = nextpow2(win) * 2**fft_over.
    Windows are symmetric Hann normalized to sum 1 (tf_preprocess.py:323-328);
    the signal is reflect-padded (wl//2, wl//2 + hop + 1) before framing
    (tf_preprocess.py:346-349).
    """

    def __init__(self, stft_config: Dict, srate: int, sync_fft_size: bool = False):
        self.config = copy.deepcopy(stft_config)
        self.srate = srate
        win_len = self.config["win_size"]
        hop_size = self.config["hop_size"]
        if not hasattr(win_len, "__getitem__"):
            win_len = [win_len]
        if not hasattr(hop_size, "__getitem__"):
            hop_size = [hop_size]
        self.win_len = [int(wl * srate) for wl in win_len]
        self.hop_size = [int(hs * srate) for hs in hop_size]
        if len(self.win_len) != len(self.hop_size):
            raise RuntimeError("MultiResStft::error::win_size and hop_size counts must match")

        if "fft_size" in self.config:
            raise RuntimeError("MultiResStft::error::fft_size is not supported, use fft_over")
        fft_over = self.config.get("fft_over", 0)
        if not hasattr(fft_over, "__getitem__"):
            fft_over = [fft_over]
        if len(fft_over) == 1:
            fft_over = fft_over * len(self.win_len)
        self.fft_size = [nextpow2_val(wl) * (2**fo) for wl, fo in zip(self.win_len, fft_over)]
        if sync_fft_size:
            mx = max(self.fft_size)
            self.fft_size = [mx for _ in self.fft_size]

        self.windows = []
        for wl in self.win_len:
            # symmetric (periodic=False) hann normalized to sum 1
            ww = make_window("hann", wl).astype(np.float32)
            self.windows.append(ww / np.sum(ww))

        self.log_2_db = 20 * np.log10(np.exp(1))
        self.lin_amp_off = self.config.get("lin_amp_off", 1e-5)
        if self.lin_amp_off is None:
            self.lin_amp_off = 1e-5
        self.rel_lin_amp_off = self.config.get("rel_lin_amp_off", False)
        self.magnitude_compression = self.config.get("magnitude_compression", None)
        self.use_lin_amp_off_for_mc = self.config.get("use_lin_amp_off_for_mc", False)

    def generate_stft(self, signal: jnp.ndarray) -> List[jnp.ndarray]:
        """(B, T) -> list of complex (B, frames, bins)."""
        specs = []
        for wl, hs, fft_size, win in zip(self.win_len, self.hop_size, self.fft_size, self.windows):
            padded = jnp.pad(signal, ((0, 0), (wl // 2, wl // 2 + hs + 1)), mode="reflect")
            specs.append(stft(padded, wl, hs, fft_size, jnp.asarray(win)))
        return specs

    def scale_spec(self, spec):
        amp = jnp.abs(spec)
        if self.magnitude_compression is not None:
            if self.use_lin_amp_off_for_mc:
                if self.rel_lin_amp_off:
                    off = jnp.max(amp, axis=(-2, -1), keepdims=True) * self.lin_amp_off
                    return jnp.power(amp + off, self.magnitude_compression)
                return jnp.power(amp + self.lin_amp_off, self.magnitude_compression)
            return jnp.power(amp, self.magnitude_compression)
        if self.rel_lin_amp_off:
            off = jnp.max(amp, axis=(-2, -1), keepdims=True) * self.lin_amp_off
            return self.log_2_db * jnp.log(amp + off)
        return self.log_2_db * jnp.log(amp + self.lin_amp_off)

    def scale_spec_man_select(self, spec, magnitude_exponent=None):
        amp = jnp.abs(spec) + self.lin_amp_off
        if magnitude_exponent is not None:
            if magnitude_exponent == 1:
                return amp
            if magnitude_exponent == 2:
                return jnp.square(amp)
            return jnp.power(amp, magnitude_exponent)
        return self.log_2_db * jnp.log(amp)


class MelLoss:
    """Single-STFT mel L1 with dynamic-range floor (TFMelProcessor +
    wavegen_1d.py:288-300)."""

    def __init__(self, preprocess_config: Dict, ign_attn_db: float):
        self.win_len = preprocess_config["win_size"]
        self.hop_size = preprocess_config["hop_size"]
        self.fft_size = preprocess_config["fft_size"]
        self.lin_amp_off = preprocess_config.get("lin_amp_off", 1e-5) or 1e-5
        self.lin_amp_scale = preprocess_config.get("lin_amp_scale", 1)
        self.mel_amp_scale = preprocess_config.get("mel_amp_scale", 1)
        self.ign_attn_db = ign_attn_db
        self.window = (self.lin_amp_scale * get_stft_window("hann", self.win_len, np.float32))
        mel_basis = mel_filter(
            sr=preprocess_config["sample_rate"], n_fft=self.fft_size,
            n_mels=preprocess_config["mel_channels"],
            fmin=preprocess_config["fmin"], fmax=preprocess_config["fmax"],
        )
        self.mel_basis_T = mel_basis.T
        self.log_db_fac = 20 * np.log10(2) / np.log(2)

    def mel_spectrogram(self, signal):
        padded = jnp.pad(signal, ((0, 0), (self.win_len // 2, self.win_len // 2 + self.hop_size + 1)),
                         mode="reflect")
        spec = jnp.abs(stft(padded, self.win_len, self.hop_size, self.fft_size, jnp.asarray(self.window)))
        from ..ops.precision import sensitive_matmul_precision

        mel = jnp.einsum("btf,fm->btm", spec, jnp.asarray(self.mel_basis_T),
                         precision=sensitive_matmul_precision())
        return self.mel_amp_scale * jnp.log(mel + self.lin_amp_off)

    def __call__(self, ref_audio, gen_audio):
        mel_in = self.mel_spectrogram(ref_audio)
        mel_syn = self.mel_spectrogram(gen_audio)
        if self.ign_attn_db > 0:
            spect_min = jnp.max(mel_in, axis=(1, 2), keepdims=True) - self.ign_attn_db / self.log_db_fac
        else:
            spect_min = -100.0
        return self.log_db_fac * jnp.mean(
            jnp.abs(jnp.maximum(mel_syn[:, : mel_in.shape[1]], spect_min) - jnp.maximum(mel_in, spect_min))
        )


def low_band_extra_weight_vector(extra_weight, transition, position, length):
    """Frequency-dependent weighting ramp (wavegen_1d.py:144-155 capability)."""
    k = np.arange(length, dtype=np.float32)
    ramp = np.clip((position + transition - k) / max(transition, 1.0), 0.0, 1.0)
    return 1.0 + extra_weight * ramp


class SpectLossComponents:
    """Aggregate spectral losses (wavegen_1d.py:32-318).

    train_with_avg / sub_sample_facts (wavegen_1d.py:42-44): when gen_audio
    carries a variants dimension (B, V, T), train_with_avg==1 strips it to
    variant 0 (the reference's only live branch, wavegen_1d.py:187-190;
    its >1 path dies upstream on an undefined syn_spec_list at :200).  Here
    train_with_avg>1 is implemented as averaging the scaled synthesis spectra
    over the variants before the error -- the semantics the name describes.
    sub_sample_facts is accepted for constructor compatibility; the reference
    never reads it after :43 and neither do we.
    """

    def __init__(self, training_config: Dict, preprocess_config: Dict, rng_seed: int = 0,
                 train_with_avg: Optional[int] = None, sub_sample_facts=None):
        self.train_with_avg = train_with_avg
        self.sub_sample_facts = sub_sample_facts
        self.preprocess_config = copy.deepcopy(preprocess_config)
        self.training_config = copy.deepcopy(training_config)
        self.sample_rate = preprocess_config["sample_rate"]
        cfg = copy.deepcopy(training_config["spect_loss_config"])

        from .schedules import ParamSchedule

        if "spect_loss_schedule" in cfg:
            sched = cfg.get("spect_loss_schedule")
            self.spect_loss_weight = None if sched is None else ParamSchedule(name="spect_loss_weight", **sched)
        elif "spect_loss_weight" in cfg:
            self.spect_loss_weight = ParamSchedule(name="spect_loss_weight", initial=cfg["spect_loss_weight"])
        else:
            self.spect_loss_weight = ParamSchedule(name="spect_loss_weight", initial=1.0)

        self.spect_error_gain = cfg.get("spect_error_gain", 1)
        self.NPOW_loss_weight = cfg.get("NPOW_loss_weight", 0) or 0
        self.mell_loss_weight = cfg.get("mell_loss_weight", 0) or 0
        self.masking_noise_level = cfg.get("masking_noise_std", 0)
        self.rel_masking_noise_atten_db = cfg.get("rel_masking_noise_atten_db", None)
        self.rel_masking_noise_level = (
            10.0 ** (-abs(self.rel_masking_noise_atten_db) / 20.0)
            if self.rel_masking_noise_atten_db is not None
            else None
        )
        self.remove_mean_hz = cfg.get("remove_mean_hz", None)
        self.mean_smoothing_win = None
        if self.remove_mean_hz:
            w = get_stft_window("nuttall4_6db", win_len=int(4 * self.sample_rate / self.remove_mean_hz),
                                dtype=np.float32)
            self.mean_smoothing_win = (w / np.sum(w)).astype(np.float32)

        # keep only resolutions with a non-zero loss_type (wavegen_1d.py:93-105)
        if "loss_type" in cfg:
            keep = [bool(lt) for lt in cfg["loss_type"]]
            cfg["win_size"] = [w for k, w in zip(keep, cfg["win_size"]) if k]
            cfg["hop_size"] = [h for k, h in zip(keep, cfg["hop_size"]) if k]
            if "fft_over" in cfg and hasattr(cfg["fft_over"], "__getitem__"):
                cfg["fft_over"] = [f for k, f in zip(keep, cfg["fft_over"]) if k]
            self.spect_loss_type = [lt for lt in cfg["loss_type"] if lt]
            cfg["loss_type"] = self.spect_loss_type
        else:
            self.spect_loss_type = None

        self.stft_processor = None
        if (self.spect_loss_weight is not None) or self.NPOW_loss_weight > 0:
            self.stft_processor = MultiResStft(cfg, self.sample_rate)
            if self.spect_loss_type is None:
                self.spect_loss_type = [SPECT_LOSS_BIT] * len(self.stft_processor.win_len)

        lbe = cfg.get("low_band_extra_weight", 0)
        if self.stft_processor is not None:
            if lbe:
                lim = cfg.get("low_band_extra_weight_limit_Hz", 0)
                tr = cfg.get("low_band_extra_weight_transition_Hz", 500)
                self.low_band_extra_weight = [
                    jnp.asarray(
                        low_band_extra_weight_vector(
                            lbe, fs * tr / self.sample_rate, fs * lim / self.sample_rate, fs // 2 + 1
                        )
                    )
                    for fs in self.stft_processor.fft_size
                ]
            else:
                self.low_band_extra_weight = [1.0 for _ in self.stft_processor.fft_size]

        self.mel_loss = None
        if self.mell_loss_weight > 0:
            ign_attn_db = 40
            if (self.preprocess_config.get("lin_amp_off") or 0) > 0:
                ign_attn_db = 0
            self.mel_loss = MelLoss(self.preprocess_config, ign_attn_db)

    def calc_spectral_error(self, ref_audio, gen_audio):
        """Returns (spect_loss, NPOW_loss) over the multi-resolution bank.

        gen_audio may be (B, T) or, with the variants capability, (B, V, T)
        (see class docstring for the train_with_avg semantics)."""
        spect_error = jnp.float32(0.0) if (self.spect_loss_weight is not None) else None
        NPOW_error = jnp.float32(0.0) if self.NPOW_loss_weight else None
        spect_cnt = 0
        NPOW_cnt = 0

        n_variants = None
        if gen_audio.ndim == 3:
            if self.train_with_avg is None or self.train_with_avg <= 1:
                gen_audio = gen_audio[:, 0]  # wavegen_1d.py:187-190
            else:
                B, n_variants, T = gen_audio.shape
                gen_audio = gen_audio.reshape(B * n_variants, T)

        def _unfold_avg(sp):
            # (B*V, frames, bins) scaled spectrum -> variant-averaged (B, ...)
            if n_variants is None:
                return sp
            return jnp.mean(sp.reshape(-1, n_variants, *sp.shape[1:]), axis=1)

        in_specs = self.stft_processor.generate_stft(ref_audio)
        syn_specs = self.stft_processor.generate_stft(gen_audio)

        for ref_sp_c, syn_sp_c, lt, lbew in zip(in_specs, syn_specs, self.spect_loss_type,
                                                self.low_band_extra_weight):
            if (self.spect_loss_weight is not None) and (lt & SPECT_LOSS_BIT):
                ref_sp = self.stft_processor.scale_spec(ref_sp_c)
                syn_sp = _unfold_avg(self.stft_processor.scale_spec(syn_sp_c))
                spect_error = spect_error + jnp.mean(jnp.abs(syn_sp - ref_sp) * lbew)
                spect_cnt += 1
            if self.NPOW_loss_weight and (lt & NPOW_LOSS_BIT):
                ref_p = self.stft_processor.scale_spec_man_select(ref_sp_c, magnitude_exponent=1)
                syn_p = _unfold_avg(
                    self.stft_processor.scale_spec_man_select(syn_sp_c, magnitude_exponent=1)
                )
                NPOW_error = NPOW_error + jnp.mean(
                    jnp.sqrt(jnp.sum(jnp.square(syn_p - ref_p) * lbew, axis=(1, 2)))
                    / jnp.sqrt(jnp.sum(jnp.square(ref_p) * lbew, axis=(1, 2)) + _EPS * _EPS)
                )
                NPOW_cnt += 1

        spect_loss_n = self.spect_error_gain * spect_error / spect_cnt if spect_cnt else None
        NPOW_loss_n = NPOW_error / NPOW_cnt if NPOW_cnt else None
        return spect_loss_n, NPOW_loss_n

    def calc_losses(self, in_audio, outputs, rng=None):
        """Returns dict of raw losses. in_audio/outputs: (B, T)."""
        mel_loss_n = spect_loss_n = NPOW_loss_n = None

        if self.mean_smoothing_win is not None:
            kern = jnp.asarray(self.mean_smoothing_win)[:, None, None]
            k = self.mean_smoothing_win.shape[0]
            sm = jax.lax.conv_general_dilated(
                in_audio[:, :, None], kern, window_strides=(1,),
                padding=[((k - 1) // 2, k - 1 - (k - 1) // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )[:, :, 0]
            in_audio = in_audio - sm
        if self.rel_masking_noise_level and rng is not None:
            rng, sub = jax.random.split(rng)
            rms = jnp.sqrt(jnp.mean(jnp.square(in_audio), axis=1, keepdims=True))
            in_audio = in_audio + jax.lax.stop_gradient(
                rms * self.rel_masking_noise_level * jax.random.normal(sub, in_audio.shape)
            )
        if self.masking_noise_level and rng is not None:
            rng, sub = jax.random.split(rng)
            in_audio = in_audio + self.masking_noise_level * jax.random.normal(sub, in_audio.shape)

        if self.stft_processor is not None:
            spect_loss_n, NPOW_loss_n = self.calc_spectral_error(in_audio, outputs)
        if self.mel_loss is not None:
            # the mel path has no variants semantics (the reference's mel
            # branch cannot consume them either, wavegen_1d.py:289); variant 0
            mel_loss_n = self.mel_loss(in_audio, outputs[:, 0] if outputs.ndim == 3 else outputs)
        return {"mel_loss": mel_loss_n, "spect_loss": spect_loss_n, "NPOW_loss": NPOW_loss_n}

    def total_loss(self, in_audio, outputs, step=0, rng=None):
        losses = self.calc_losses(in_audio, outputs, rng=rng)
        total = jnp.float32(0.0)
        if losses["spect_loss"] is not None and self.spect_loss_weight is not None:
            total = total + losses["spect_loss"] * self.spect_loss_weight(step)
        if losses["mel_loss"] is not None:
            total = total + losses["mel_loss"] * self.mell_loss_weight
        if losses["NPOW_loss"] is not None:
            total = total + losses["NPOW_loss"] * self.NPOW_loss_weight
        return total, losses


# ---------------------------------------------------------------- F0 losses


def _dilate_mask(mask, kernel_len):
    """Binary mask dilation by a ones-kernel conv, left then right
    (custom_pulsed_generator.py:528-552)."""
    kern = jnp.ones((kernel_len, 1, 1), dtype=mask.dtype)
    left = jax.lax.conv_general_dilated(
        jnp.pad(mask, ((0, 0), (kernel_len - 1, 0)))[:, :, None], kern, (1,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    right = jax.lax.conv_general_dilated(
        jnp.pad(left, ((0, 0), (0, kernel_len - 1), (0, 0))), kern, (1,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return right[:, :, 0]


def f0_pred_loss_mask(target_F0, limit_samples):
    """1 where the F0 prediction loss applies: voiced regions eroded by
    extending unvoiced segments (custom_pulsed_generator.py:528-539)."""
    unvoiced = (target_F0 == 0).astype(jnp.float32)
    extended = _dilate_mask(unvoiced, limit_samples + 1)
    return (extended == 0).astype(jnp.float32)


def f0_rec_loss_mask(target_F0, limit_samples):
    """1 on voiced segments extended into unvoiced neighbourhoods
    (custom_pulsed_generator.py:541-552)."""
    voiced = (target_F0 != 0).astype(jnp.float32)
    extended = _dilate_mask(voiced, limit_samples + 1)
    return (extended != 0).astype(jnp.float32)


def f0_prediction_loss(pred_F0, target_F0, pred_mask, method="L1", uv_weight=None, rec_mask=None,
                       min_frequency=40.0):
    """Masked F0 regression loss (custom_pulsed_generator.py:589-613)."""
    diff = jnp.maximum(target_F0, min_frequency) - pred_F0[:, : target_F0.shape[1]]
    if uv_weight:
        prediction_loss_mask = pred_mask + (1 - rec_mask)
        diff = diff * prediction_loss_mask
        weight = jnp.maximum(pred_mask, uv_weight * prediction_loss_mask)
        max_lim = 0.0
    else:
        weight = pred_mask
        max_lim = 1.0
    denom = jnp.maximum(jnp.sum(weight), max_lim)
    if method in ("L2", "l2", "least_squares"):
        return jnp.sum(jnp.square(diff * weight)) / denom
    if method in ("L1", "l1"):
        return jnp.sum(jnp.abs(diff * weight)) / denom
    if method in ("RMSE", "rmse"):
        return jnp.sqrt(jnp.sum(jnp.square(diff) * weight) / denom)
    raise RuntimeError(f"unknown F0 loss method {method}")


def stft_coherence_loss(signal_stft_coh, win_size, hop_size, fft_size, istft_window, stft_window):
    """Penalize inconsistent (non-realizable) STFTs: resynthesize then
    re-analyse and compare magnitudes (custom_pulsed_generator.py:725-739)."""
    from ..ops.stft_ops import istft as _istft, stft as _stft

    sig = _istft(signal_stft_coh, win_size, hop_size, fft_size, istft_window)
    back = _stft(sig, win_size, hop_size, fft_size, stft_window)
    T = min(signal_stft_coh.shape[1], back.shape[1])
    a = jnp.abs(signal_stft_coh[:, :T])
    b = jnp.abs(back[:, :T])
    return jnp.mean(jnp.square(a - b)) / jnp.mean(jnp.square(a))
