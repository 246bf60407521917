"""PaNWaveNet facade + mel-RMS normalisation components.

reference: MBExWN_NVoc/vocoder/model/wavegen_1d.py:321-575 (WaveGenerator /
PaNWaveNet) and :578-769 (NormMelComponents).
"""
from __future__ import annotations

import copy
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import mel_filter, mel_frequencies
from ..dsp.windows import get_stft_window
from ..ops.interp import linear_interp_upsample
from ..ops.stft_ops import overlap_and_add
from .mbexwn import MBExWN

_EPS = 1e-7  # tf.keras.backend.epsilon()


class NormMelComponents:
    """Estimate frame RMS from the mel spectrogram, normalise the mel by it
    and return the upsampled RMS to re-apply as an output gain.

    reference: wavegen_1d.py:578-769.  NOTE: the reference's
    num_smooth_iters==0 branch reduces over the wrong axis (wavegen_1d.py:728
    takes a per-channel time-mean, incompatible with the downstream
    interpolation); here the documented estimator -- per-frame RMS from the
    mel-band energies -- is used for both branches.
    """

    def __init__(
        self,
        preprocess_config: Dict,
        n_group: int = 1,
        max_norm_fact=None,
        normalize_compressor_exp=None,
        lin_amp_scale: float = 1.0,
        lin_amp_off: float = 1.0e-5,
        mel_amp_scale: float = 1.0,
        use_max_limit: bool = False,
        normalize_use_pinv: bool = False,
        normalize_rms_num_smooth_iters: int = 0,
        normalize_smooth_win_scale: float = 1,
        normalize_smooth_with_squared_win: bool = True,
        **_,
    ):
        self.preprocess_config = copy.deepcopy(preprocess_config)
        self.spect_win_size = self.preprocess_config.get("win_size", self.preprocess_config["fft_size"])
        self.spect_hop_size = self.preprocess_config["hop_size"]
        if 4 * self.spect_hop_size != self.spect_win_size:
            raise RuntimeError(
                "NormMelComponents:error: this module currently supports only win_size == 4*hop_size"
            )
        self.n_group = n_group
        self.rms_norm_fact = self.preprocess_config["fft_size"] * self.spect_win_size * 0.5
        self.use_pinv = normalize_use_pinv
        self.smooth_win_scale = normalize_smooth_win_scale
        self.mel_channels = preprocess_config["mel_channels"]

        if normalize_use_pinv:
            self.win_norm = np.sqrt(
                np.sum(get_stft_window(win_type="hann", win_len=self.spect_win_size, dtype=np.float32) ** 2)
            )
            mel_basis = mel_filter(
                sr=preprocess_config["sample_rate"],
                n_fft=preprocess_config["fft_size"],
                n_mels=self.mel_channels,
                fmin=preprocess_config["fmin"],
                fmax=preprocess_config["fmax"],
            )
            self.mel_band_filter_inverted = np.linalg.pinv(mel_basis).T.astype(np.float32)
        else:
            mel_f = mel_frequencies(
                n_mels=self.mel_channels + 2, fmin=preprocess_config["fmin"], fmax=preprocess_config["fmax"]
            )
            self.inv_enorm = ((mel_f[2 : self.mel_channels + 2] - mel_f[: self.mel_channels]) / 2.0).astype(
                np.float32
            )

        self.normalize_rms_num_smooth_iters = max(0, normalize_rms_num_smooth_iters or 0)
        self.scale_mel_lin_amp_scale = lin_amp_scale
        self.max_norm_fact = max_norm_fact
        self.scale_mel_lin_amp_off = lin_amp_off
        self.normalize_compressor_exp = normalize_compressor_exp
        self.scale_mel_mel_amp_scale = mel_amp_scale
        self.scale_mel_use_max_limit = use_max_limit

        win = get_stft_window("hann", win_len=self.spect_win_size, dtype=np.float32)
        self.gwin = (win / np.sum(win)).astype(np.float32)
        self.smooth_win_size = int(self.spect_win_size * self.smooth_win_scale)
        smooth_syn_win = get_stft_window("hann", win_len=self.smooth_win_size, dtype=np.float32)
        if normalize_smooth_with_squared_win:
            smooth_syn_win = smooth_syn_win**2
        self.smooth_syn_win = smooth_syn_win

    def _estimate_rms(self, mel):
        """Per-frame RMS estimate (B, T) from linear-amplitude mel (B, T, C)."""
        if self.use_pinv:
            from ..ops.precision import sensitive_matmul_precision

            spec = jnp.einsum("btc,cf->btf", mel, jnp.asarray(self.mel_band_filter_inverted),
                              precision=sensitive_matmul_precision()) / self.win_norm
            return jnp.sqrt(jnp.sum(jnp.square(spec), axis=-1) / self.rms_norm_fact)
        return jnp.sqrt(
            jnp.sum(jnp.square(mel * jnp.asarray(self.inv_enorm)), axis=-1) / self.rms_norm_fact
        )

    def normalize_inputs_by_rms(self, audio, mell, synth_length=None):
        """Returns (grp_audio, normalized mell, upsampled_rms).

        reference: wavegen_1d.py:638-769
        """
        if audio is not None:
            snd_lengths = audio.shape[1]
        elif synth_length is not None:
            snd_lengths = synth_length
        else:
            raise RuntimeError("normalize_inputs_by_rms:error:either audio or synth_length needed")

        mel = jnp.exp(mell)
        rms_mel_ampl = self._estimate_rms(mel)
        if self.max_norm_fact:
            rms_mel_ampl = jnp.maximum(rms_mel_ampl, np.float32(1.0 / self.max_norm_fact))
        if self.normalize_compressor_exp is not None:
            rms_mel_ampl = jnp.power(rms_mel_ampl, self.normalize_compressor_exp)

        gain = None
        if self.normalize_rms_num_smooth_iters > 0:
            # iterative overlap-add smoothing of the gain contour
            # (wavegen_1d.py:697-726)
            hop, win = self.spect_hop_size, self.spect_win_size
            swin = jnp.asarray(self.smooth_syn_win)
            sws = self.smooth_win_size
            T = rms_mel_ampl.shape[1]
            off = sws // 2 + 2 * hop - win // 2

            ones = jnp.ones((1, T + 4), dtype=mell.dtype)
            norm_gain = overlap_and_add(ones[:, :, None] * swin[None, None, :], hop)[:, off:]

            for _ in range(self.normalize_rms_num_smooth_iters):
                padded = jnp.concatenate(
                    (rms_mel_ampl[:, :1], rms_mel_ampl[:, :1], rms_mel_ampl,
                     rms_mel_ampl[:, -1:], rms_mel_ampl[:, -1:]), axis=1
                )
                gain_frames = padded[:, :, None] * swin[None, None, :]
                gain = overlap_and_add(gain_frames, hop)[:, off:]
                gain = gain / jnp.maximum(_EPS, norm_gain)
                # resample the smoothed gain back to the frame grid through
                # the analysis window
                kern = jnp.asarray(self.gwin)[:, None, None]
                rms_mel_ampl = jax.lax.conv_general_dilated(
                    gain[:, :, None], kern, window_strides=(hop,), padding=[(0, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )[:, : mell.shape[1], 0]
            rms_mel_ampl_e = rms_mel_ampl[:, :, None]
        else:
            rms_mel_ampl_e = rms_mel_ampl[:, :, None]

        mel = mel / jnp.maximum(_EPS, rms_mel_ampl_e) * self.scale_mel_lin_amp_scale
        if self.scale_mel_use_max_limit:
            mell_out = self.scale_mel_mel_amp_scale * jnp.log(jnp.maximum(mel, self.scale_mel_lin_amp_off))
        else:
            mell_out = self.scale_mel_mel_amp_scale * jnp.log(mel + self.scale_mel_lin_amp_off)

        if self.normalize_rms_num_smooth_iters > 0:
            gain_off = int(self.spect_win_size // 2)
            upsampled_rms = jnp.maximum(gain[..., gain_off : gain_off + snd_lengths], _EPS)
            upsampled_rms = upsampled_rms.reshape(mell.shape[0], -1, self.n_group)
        else:
            upsampled_rms = linear_interp_upsample(rms_mel_ampl_e, self.spect_hop_size)

        grp_audio = None
        target_t = (snd_lengths // self.n_group)
        if upsampled_rms.shape[1] < target_t:
            upsampled_rms = jnp.concatenate(
                (upsampled_rms, jnp.repeat(upsampled_rms[:, -1:, :], target_t - upsampled_rms.shape[1], axis=1)),
                axis=1,
            )
        elif upsampled_rms.shape[1] > target_t:
            upsampled_rms = upsampled_rms[:, :target_t]
        if audio is not None:
            grp_audio = audio.reshape(audio.shape[0], -1, self.n_group) / upsampled_rms
        return grp_audio, mell_out, upsampled_rms


class PaNWaveNet:
    """Top-level model: mel -> waveform, with components API.

    reference: wavegen_1d.py:406-575
    """

    def __init__(self, model_config: Dict, training_config: Dict, preprocess_config: Dict,
                 quiet: bool = True, name: str = "myWaveGlow", **_):
        self.name = name
        self.model_config = copy.deepcopy(model_config)
        self.training_config = copy.deepcopy(training_config)
        self.preprocess_config = copy.deepcopy(preprocess_config)

        self.norm_mel_components = None
        if self.model_config.get("normalize_rms_from_mell", False):
            self.norm_mel_components = NormMelComponents(preprocess_config=preprocess_config, **model_config)

        self.sample_rate = preprocess_config["sample_rate"]
        self.mel_channels = preprocess_config["mel_channels"]
        self.segment_length = preprocess_config["segment_length"]
        self.spect_hop_size = preprocess_config["hop_size"]
        self.win_size = preprocess_config["win_size"]
        self.sigma = self.model_config.get("sigma", None)

        model_config_nonorm = copy.deepcopy(model_config)
        for k in (
            "normalize_rms_from_mell",
            "normalize_rms_num_smooth_iters",
            "normalize_compressor_exp",
            "normalize_smooth_win_scale",
            "normalize_smooth_with_squared_win",
            "normalize_use_pinv",
            "max_norm_fact",
        ):
            model_config_nonorm.pop(k, None)

        if "ps_max_db_range" in model_config_nonorm:
            # map deprecated config name (wavegen_1d.py:424-430)
            model_config_nonorm["filter_max_db_range"] = model_config_nonorm.pop("ps_max_db_range")
            if model_config_nonorm.get("ns_max_db_range") != model_config_nonorm["filter_max_db_range"]:
                raise RuntimeError("setting ns_max_db_range != ps_max_db_range is not supported")
            model_config_nonorm.pop("ns_max_db_range", None)

        if "pulse_rate_factor" not in model_config_nonorm:
            raise NotImplementedError(
                "PaNWaveNet::error:: required parameter pulse_rate_factor is missing in your model config."
            )
        self.block = MBExWN(**model_config_nonorm, preprocess_config=preprocess_config, quiet=quiet)

    @property
    def has_components(self):
        return True

    def init(self, rng, batch_size: int = 1, T_mel: int = 32):
        params, _ = self.block.init(rng, (batch_size, T_mel, self.mel_channels))
        return params

    def infer(self, params, spect, sigma=None, synth_length=0, F0=None, return_F0=False,
              return_components=False, rng=None, phase_offset=None, **_):
        """Generate sound from a mel spectrogram (wavegen_1d.py:483-526)."""
        synth_length = synth_length if synth_length else self.segment_length
        if spect.shape[1] * self.spect_hop_size < synth_length:
            spect = jnp.concatenate((spect, spect[:, -1:]), axis=1)

        if self.norm_mel_components is not None:
            _, in_mell, upsampled_rms = self.norm_mel_components.normalize_inputs_by_rms(
                None, spect, synth_length=synth_length
            )
        else:
            in_mell = spect
            upsampled_rms = None

        signals, PP = self.block(params, in_mell, F0=F0, return_PP=return_F0,
                                 return_components=return_components, rng=rng,
                                 phase_offset=phase_offset)
        out = []
        for sig in signals:
            if sig is None:
                out.append(None)
                continue
            tmp = sig[:, :synth_length]
            if upsampled_rms is not None:
                tmp = tmp * upsampled_rms[:, :synth_length, 0]
            out.append(tmp)

        if return_F0:
            for pp in PP:
                pp[1] = pp[1][:, :synth_length]
            if return_components:
                return out, PP
            return out[0], PP
        if return_components:
            return out
        return out[0]

    def infer_components(self, params, spect, synth_length=0, F0=None, transposition_factor=None, rng=None):
        """Decomposed inference: (F0, excitation, specenv, upsampled_rms).

        reference: wavegen_1d.py:528-557
        """
        synth_length = synth_length if F0 is None else F0.shape[1]
        if synth_length and spect.shape[1] * self.spect_hop_size < synth_length:
            spect = jnp.concatenate((spect, spect[:, -1:]), axis=1)

        if self.norm_mel_components is not None:
            _, in_mell, upsampled_rms = self.norm_mel_components.normalize_inputs_by_rms(
                None, spect, synth_length=synth_length or spect.shape[1] * self.spect_hop_size
            )
            upsampled_rms = upsampled_rms[:, :, 0]
        else:
            in_mell = spect
            upsampled_rms = None

        if F0 is None:
            F0 = self.block.generate_f0(params, in_mell)
        if transposition_factor:
            F0 = transposition_factor * F0
        excitation_signal = self.block.generate_excitation(params, in_mell, F0, rng=rng)
        specenv = self.block.generate_specenv(params, in_mell, F0, training=False)
        return F0, excitation_signal, specenv, upsampled_rms
