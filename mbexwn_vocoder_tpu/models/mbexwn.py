"""MBExWN core generator: F0 predictor -> wavetable excitation -> gated
WaveNet reshaping -> PQMF synthesis -> cepstral spectral-envelope filter.

reference: MBExWN_NVoc/vocoder/model/custom_pulsed_generator.py:151-1161.

Everything here is functional and jit-compilable end-to-end: one traced
program from mel input to waveform output (the reference's TF graph has the
same boundary).  Static time algebra lives in `*_length` helpers; all shapes
under jit are static.
"""
from __future__ import annotations

import copy
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.pqmf import pqmf_filters
from ..dsp.wavetable import WavetableSpec, build_wavetable_grid
from ..dsp.windows import hann_periodic
from ..nn.core import Module
from ..nn.subnet import generate_subnet_from_specs
from ..nn.wavenet import WaveNetAEBlock
from ..nn.layers import Conv1DWeightNorm, LinInterpLayer
from ..ops.oscillator import grid_crossfade, stable_cumsum_and_wrap, wavetable_lookup
from ..ops.stft_ops import inverse_stft_window, istft, stft

log_to_db = 20 * np.log10(np.exp(1))

import os as _os


def _use_pallas_oscillator() -> bool:
    """Pallas fused-oscillator kernel (experimental; MBEXWN_PALLAS=1 to
    enable).  The lane-major kernel compiles on TPU hardware and is bit-exact
    vs the XLA path, but measured 12x SLOWER (27.7 vs 2.26 ms at 32x19200):
    its (n_grid=13)-row output tile starves the MXU, while the default XLA
    tent-matmul path rides the MXU at full width (PERFORMANCE.md "Pallas
    oscillator"; tests/test_pallas_kernels.py guards equivalence).  Kept
    as a reference point for future fusion work, never as the default."""
    return _os.environ.get("MBEXWN_PALLAS", "0") in ("1", "on", "true")


def _use_fused_subnet_tail() -> bool:
    """Fused F0-subnet tail (MBEXWN_FUSED_TAIL=1): runs the trailing
    LinInterp -> PReLU -> 1x1-conv -> activation chain as one einsum at the
    pre-interpolation rate, so the (B, T_12kHz, C) intermediates never
    reach HBM (nn/subnet.py::_TailFusedSequential).  Bit-compatible with the
    layered path (same params, same math); opt-in until the measured win on
    hardware is recorded in PERFORMANCE.md."""
    return _os.environ.get("MBEXWN_FUSED_TAIL", "0") in ("1", "on", "true")


class MBExWN(Module):
    """Synthesize audio from mel spectrograms via a multi-band excited WaveNet."""

    def __init__(
        self,
        preprocess_config: Dict,
        pp_subnet,
        ps_subnet,
        pp_mod_subnet: Dict,
        pp_mod_subnet_upsampling_factors: List[int],
        pp_mod_subnet_channel_factors: List[int],
        multi_band_config: Union[None, Dict],
        pp_min_frequency: float = 40.0,
        pp_max_frequency: float = 600.0,
        pp_teacher_forcing_schedule=None,
        pp_F0_pred_loss_limits_ms: float = 0.0,
        pp_F0_rec_loss_limits_ms: float = 0.0,
        pp_activation: str = "soft_sigmoid",
        pp_F0_loss_weight=None,
        pp_F0_loss_method: str = "L1",
        pp_F0_UV_loss_weight=None,
        pp_mod_subnet_noise_channel_sigma: float = 0.5,
        pp_mod_subnet_use_pqmf: bool = True,
        pp_subnet_use_valid_padding: bool = False,
        pp_subnet_training_only: bool = False,
        pp_subnet_exclude_from_pretrain: bool = False,
        pp_subnet_suppress_uv_gradient: bool = False,
        ps_max_ceps_coefs: int = 120,
        ps_env_order_scale=None,
        ps_subnet_use_valid_padding: bool = False,
        ps_use_stft: bool = True,
        ps_off: bool = False,
        filter_max_db_range=None,
        psns_gain_loss_weight=None,
        psns_use_cepstral_loss_constraint: bool = False,
        psns_cepstral_loss_weight=0.5,
        spect_filters_preserve_energy: bool = False,
        stft_coh_loss_weight=None,
        remove_inactive_pad_layers: bool = False,
        use_prelu: bool = True,
        pulse_rate_factor: int = 2,
        pulse_channels: int = 8,
        pulse_channels_use_pqmf: bool = False,
        pulse_channels_multi_band_config=None,
        force_causal: bool = False,
        wavetable_config: Dict = None,
        alpha: float = 0.2,
        dump_controls: bool = False,
        pulse_noise_floor_db=-90,
        internal_win_size_s=None,
        internal_fft_over: int = 0,
        name: str = "MBExWNGen",
        quiet: bool = True,
        remat_wavenet_blocks: bool = False,
        wn_compute_dtype=None,
        subnet_compute_dtype=None,
    ):
        self.name = name
        self.preprocess_config = copy.deepcopy(preprocess_config)
        self.sample_rate = preprocess_config["sample_rate"]
        self.spect_hop_size = preprocess_config["hop_size"]
        self.mel_channels = preprocess_config["mel_channels"]

        self.force_causal = force_causal
        self.use_prelu = use_prelu
        self.alpha = alpha
        self.remat_wavenet_blocks = remat_wavenet_blocks
        self.remove_inactive_pad_layers = remove_inactive_pad_layers

        # internal rate algebra (custom_pulsed_generator.py:334-353)
        self.multi_band_config = copy.deepcopy(multi_band_config)
        self.mb_factor = self.multi_band_config["subbands"]
        self.pulse_rate_factor = pulse_rate_factor
        self.pulse_rate = self.sample_rate / pulse_rate_factor
        self.pulse_channels = pulse_channels
        self.pp_mod_subnet_use_pqmf = pp_mod_subnet_use_pqmf
        self.pulse_channels_use_pqmf = pulse_channels_use_pqmf
        self.pulse_channels_multi_band_config = pulse_channels_multi_band_config
        self.spect_to_subband_upsampling_factor = self.spect_hop_size // self.mb_factor
        self.spect_to_pulse_upsampling_factor = (
            self.spect_to_subband_upsampling_factor * pulse_channels
        ) // int(np.prod(pp_mod_subnet_upsampling_factors))
        self.F0_down_sampling_factor = int(self.sample_rate // self.pulse_rate)

        self.pp_min_frequency = pp_min_frequency
        self.pp_max_frequency = pp_max_frequency
        self.pp_activation = pp_activation
        self.pp_subnet_training_only = pp_subnet_training_only
        self.pp_subnet_use_valid_padding = pp_subnet_use_valid_padding
        self.pp_F0_loss_method = pp_F0_loss_method
        self.pp_F0_loss_weight = pp_F0_loss_weight
        self.pp_F0_UV_loss_weight = pp_F0_UV_loss_weight
        self.pp_F0_pred_loss_limits_ms = pp_F0_pred_loss_limits_ms
        self.pp_F0_rec_loss_limits_ms = pp_F0_rec_loss_limits_ms
        self.pp_teacher_forcing_schedule = pp_teacher_forcing_schedule
        self.pp_subnet_suppress_uv_gradient = pp_subnet_suppress_uv_gradient
        self.pp_subnet_exclude_from_pretrain = pp_subnet_exclude_from_pretrain

        # reduced-precision mode for the conditioning subnets (F0 predictor /
        # spectral-envelope stacks).  Activations and kernels run in the
        # subnet compute dtype (bfloat16); the outputs are cast back to the
        # input dtype so the oscillator phase integral, the cepstral rDFT/exp,
        # and the STFT filtering stay fp32.  bf16 quantizes the predicted F0
        # by ~2^-9 relative (~3 cents).
        #
        # Precedence: env var > config key > fp32.  The registry configs ship
        # bfloat16 compute (the fp32 WaveNet already runs at the fp32 MXU
        # peak, so reduced-precision compute is the only 2-4x lever; params,
        # MXU accumulation and the envelope numerics stay fp32 -- measured
        # quality cost in PERFORMANCE.md).  Oracle parity tests pin fp32.
        def _dtype_pref(env_name, config_value):
            env = _os.environ.get(env_name)
            if env is not None:
                return env or None  # MBEXWN_*_DTYPE= (empty) forces fp32
            return config_value or None

        self.subnet_compute_dtype = _dtype_pref("MBEXWN_SUBNET_DTYPE", subnet_compute_dtype)
        self.wn_compute_dtype = _dtype_pref("MBEXWN_WN_DTYPE", wn_compute_dtype)

        # F0 predictor subnet (frame rate -> pulse rate)
        self.pp_subnet_spec = copy.deepcopy(pp_subnet)
        self.pp_subnet = None
        if self.pp_subnet_spec:
            self.pp_subnet, _ = generate_subnet_from_specs(
                self.pp_subnet_spec,
                base_name="PulsPar",
                final_n_channels=1,
                final_nks=1,
                final_activation=pp_activation,
                force_causal=force_causal,
                pad_to_valid=pp_subnet_use_valid_padding,
                target_ups=self.spect_to_pulse_upsampling_factor,
                remove_inactive_pad_layers=remove_inactive_pad_layers,
                use_prelu=use_prelu,
                alpha=alpha,
            )
            if _use_fused_subnet_tail():
                from ..nn.subnet import fuse_subnet_tail

                self.pp_subnet = fuse_subnet_tail(self.pp_subnet)

        if pp_subnet_training_only:
            return

        # rate-consistency check (custom_pulsed_generator.py:344-353)
        ups_prod = int(np.prod(pp_mod_subnet_upsampling_factors))
        if self.pulse_rate / pulse_channels * ups_prod * self.mb_factor != self.sample_rate:
            raise RuntimeError(
                f"MBExWN::config_error::the generated sample rate "
                f"{self.pulse_rate / pulse_channels * ups_prod * self.mb_factor} != {self.sample_rate}"
            )

        # wavetable oscillator (init-time table build)
        self.wavetable_config = copy.deepcopy(wavetable_config)
        self.wavetable: WavetableSpec = build_wavetable_grid(
            sample_rate=self.pulse_rate, quiet=quiet, **wavetable_config
        )

        # spectral-envelope subnet + cepstral machinery
        self.ps_subnet_spec = copy.deepcopy(ps_subnet)
        self.ps_max_ceps_coefs = ps_max_ceps_coefs
        self.ps_env_order_scale = ps_env_order_scale
        self.ps_use_stft = ps_use_stft
        self.ps_off = ps_off
        self.ps_subnet_use_valid_padding = ps_subnet_use_valid_padding
        self.filter_max_db_range = filter_max_db_range
        self.filter_max_log_range = filter_max_db_range / log_to_db if filter_max_db_range is not None else None
        self.psns_gain_loss_weight = psns_gain_loss_weight
        self.psns_use_cepstral_loss_constraint = psns_use_cepstral_loss_constraint
        self.psns_cepstral_loss_weight = psns_cepstral_loss_weight
        self.spect_filters_preserve_energy = spect_filters_preserve_energy
        self.stft_coh_loss_weight = stft_coh_loss_weight
        self.pulse_noise_floor_db = pulse_noise_floor_db
        self.pulse_noise_floor_mag = None
        if pulse_noise_floor_db is not None:
            self.pulse_noise_floor_mag = 10 ** (-abs(pulse_noise_floor_db) / 20)

        # internal STFT geometry (custom_pulsed_generator.py:391-400)
        self.internal_win_size_s = internal_win_size_s
        self.internal_fft_over = internal_fft_over
        if internal_win_size_s:
            self.stft_win_size = int(internal_win_size_s * self.sample_rate)
        else:
            self.stft_win_size = 4 * self.spect_hop_size
        fft_size = 16
        while fft_size < self.stft_win_size:
            fft_size *= 2
        self.fft_size = fft_size * (2 ** internal_fft_over)
        self.stft_window = hann_periodic(self.stft_win_size)
        self.istft_window = inverse_stft_window(self.stft_win_size, self.spect_hop_size, self.stft_window)

        # F0-smoothing kernel for the cepstral-window selection
        # (bartlett without boundary zeros, custom_pulsed_generator.py:403-406)
        smooth_win = np.bartlett(2 * self.spect_hop_size + 3)[1:-1]
        self.frequency_smoothing_kernel = (smooth_win / np.sum(smooth_win)).astype(np.float32)

        self.ps_subnet = None
        self.ps_gain_interpolator = None
        self.ps_cepstral_windows = None
        self.ps_cepstral_windows_log10f0 = None
        if not ps_off:
            self.ps_subnet, _ = generate_subnet_from_specs(
                self.ps_subnet_spec,
                base_name="PS",
                final_nks=1,
                final_n_channels=ps_max_ceps_coefs if ps_use_stft else self.mb_factor,
                final_activation=None,
                pad_to_valid=ps_subnet_use_valid_padding,
                force_causal=force_causal,
                remove_inactive_pad_layers=remove_inactive_pad_layers,
                weight_init_scale=0.01,
                use_prelu=use_prelu,
                alpha=alpha,
            )
            if ps_use_stft:
                if ps_env_order_scale:
                    # 30 log-spaced half-hamming cepstral windows, one per F0
                    # decade step (custom_pulsed_generator.py:434-450)
                    cepstral_windows = []
                    cepstral_windows_log10f0 = []
                    for f0 in np.logspace(np.log10(pp_min_frequency), np.log10(pp_max_frequency), 30):
                        win_len = int(ps_env_order_scale * 0.5 * self.sample_rate / f0)
                        if (win_len // 2) * 2 == win_len:
                            win_len += 1
                        cepstral_windows_log10f0.append(np.log10(f0))
                        half = np.hamming(win_len)[win_len // 2 :]
                        if win_len // 2 + 1 > ps_max_ceps_coefs:
                            cepstral_windows.append(half[:ps_max_ceps_coefs])
                        else:
                            cepstral_windows.append(
                                np.concatenate((half, np.zeros(ps_max_ceps_coefs - 1 - (win_len // 2))), axis=0)
                            )
                    self.ps_cepstral_windows_log10f0 = np.asarray(cepstral_windows_log10f0, dtype=np.float32)
                    self.ps_cepstral_windows = np.asarray(cepstral_windows, dtype=np.float32)
            else:
                self.ps_gain_interpolator = LinInterpLayer(
                    upsampling_factor=self.spect_hop_size, num_pad_end=1, name="ps_gain_interp"
                )

        # WaveNet blocks (custom_pulsed_generator.py:456-493)
        pp_mod = copy.deepcopy(pp_mod_subnet)
        self.pp_mod_subnet_config = copy.deepcopy(pp_mod_subnet)
        self.pp_mod_subnet_noise_channel_sigma = pp_mod_subnet_noise_channel_sigma
        self.pp_mod_subnet_upsampling_factors = list(pp_mod_subnet_upsampling_factors)
        self.pp_mod_subnet_channel_factors = list(pp_mod_subnet_channel_factors)
        self.pp_mod_subnet_num_channels = pp_mod.pop("n_channels")
        self.pp_mod_subnet_cond_lin_upsampling = pp_mod.pop("cond_lin_upsampling", 16)
        self.pp_mod_subnet_cond_kernel_size = pp_mod.pop("cond_kernel_size", 3)

        self.pp_waveNetBlocks: List[WaveNetAEBlock] = []
        curr_pulse_rate = self.pulse_rate / self.pulse_channels
        spect_rate = self.sample_rate / self.spect_hop_size
        for iwn, (ups, chan_fac) in enumerate(
            zip(self.pp_mod_subnet_upsampling_factors, self.pp_mod_subnet_channel_factors)
        ):
            lin = self.pp_mod_subnet_cond_lin_upsampling
            if curr_pulse_rate != (curr_pulse_rate // (spect_rate * lin)) * spect_rate * lin:
                raise RuntimeError(
                    f"MBExWN::config_error:: cannot achieve conditioning rate {curr_pulse_rate} by integer "
                    f"upsampling of spectrum rate {spect_rate} with linear up {lin}"
                )
            if force_causal:
                pp_mod["padding"] = "CAUSAL"
            self.pp_waveNetBlocks.append(
                WaveNetAEBlock(
                    **pp_mod,
                    n_channels=int(self.pp_mod_subnet_num_channels * chan_fac),
                    up_sample=None if ups <= 1 else True,
                    up_down_factor=ups,
                    cond_kernel_size=self.pp_mod_subnet_cond_kernel_size,
                    cond_conv_upsampling=int(curr_pulse_rate // (spect_rate * lin)),
                    cond_lin_upsampling=lin,
                    # reduced-precision WaveNet activations; params and MXU
                    # accumulation stay fp32, the envelope path stays fp32
                    # regardless (SURVEY §7.8)
                    compute_dtype=self.wn_compute_dtype,
                    # MBEXWN_TP_AXIS=model: shard the WaveNet channel dim over
                    # that mesh axis (needs an ambient jax.set_mesh mesh)
                    tp_axis=_os.environ.get("MBEXWN_TP_AXIS") or None,
                    name=f"PP_waveNetBlock_ups{ups}_{iwn}",
                )
            )
            curr_pulse_rate *= ups

        self.wn_post_net = Conv1DWeightNorm(
            self.mb_factor, kernel_size=1, use_weight_norm=True, name=self.name + "_PaNMPulseWaveNet_Post"
        )

        self.pqmf_filters = None
        if pp_mod_subnet_use_pqmf:
            self.pqmf_filters = pqmf_filters(
                self.multi_band_config["subbands"],
                self.multi_band_config["taps"],
                self.multi_band_config["cutoff_ratio"],
                self.multi_band_config["beta"],
                self.multi_band_config.get("max_band"),
            )
        self.pulse_pqmf_filters = None
        if pulse_channels_use_pqmf:
            c = pulse_channels_multi_band_config
            self.pulse_pqmf_filters = pqmf_filters(
                c["subbands"], c["taps"], c["cutoff_ratio"], c["beta"], c.get("max_band")
            )
        self.log_to_log10 = 1 / np.log(10)

    # ------------------------------------------------------------------ init

    @property
    def wn_fold_factor(self):
        """Time decimation from the pulse rate to the WaveNet input rate.

        The reshape fold decimates by pulse_channels; the PQMF-analysis fold
        decimates by its own subband count (the rate algebra requires the two
        to agree, custom_pulsed_generator.py:892-900).
        """
        return (
            self.pulse_channels_multi_band_config["subbands"]
            if self.pulse_channels_use_pqmf
            else self.pulse_channels
        )

    @property
    def wn_in_channels(self):
        """Channel count entering the first WaveNet block: the folded pulse
        channels + subharmonic channels + the optional noise channel.  Single
        source of truth -- init, the FLOP estimator, and the stage profiler
        all derive from this (custom_pulsed_generator.py:892-906)."""
        return self.wn_fold_factor + self.pulse_channels * self.wavetable.add_subharm_chans + (
            1 if self.pp_mod_subnet_noise_channel_sigma else 0
        )

    def init(self, rng, mel_shape):
        B, T_mel, C = mel_shape
        params = {}
        r = iter(jax.random.split(rng, 8))
        if self.pp_subnet is not None:
            p, _ = self.pp_subnet.init(next(r), mel_shape)
            params["pp_subnet"] = p
        if self.pp_subnet_training_only:
            return params, None

        if self.ps_subnet is not None:
            p, _ = self.ps_subnet.init(next(r), mel_shape)
            params["ps_subnet"] = p

        # wavetables (non-trainable by default but stored with the params so a
        # trainable-wavetable config keeps working)
        params["wavetables"] = jnp.asarray(self.wavetable.wavetables)

        t_pulse = T_mel * self.spect_to_pulse_upsampling_factor
        curr_shape = (B, t_pulse // self.wn_fold_factor, self.wn_in_channels)
        for bl in self.pp_waveNetBlocks:
            p, curr_shape = bl.init(next(r), (curr_shape, mel_shape))
            params[bl.name] = p
        p, curr_shape = self.wn_post_net.init(next(r), curr_shape)
        params["wn_post_net"] = p
        return params, None

    # ------------------------------------------------------------- subpaths

    def _run_subnet(self, subnet, params, mel):
        """Run a conditioning subnet, optionally in reduced precision.

        With MBEXWN_SUBNET_DTYPE=bfloat16 the kernels and activations are
        cast to bf16 for the conv stack (halving its HBM traffic) and the
        result is cast back to the caller's dtype.
        """
        dt = self.subnet_compute_dtype
        if dt is None:
            return subnet(params, mel)
        cast = lambda t: t.astype(dt) if jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating) else t
        p = jax.tree_util.tree_map(cast, params)
        return subnet(p, mel.astype(dt)).astype(mel.dtype)

    def generate_f0(self, params, mel):
        """(B, T_mel, C) -> (B, T_mel*spect_to_pulse_ups) F0 contour in Hz.

        reference: custom_pulsed_generator.py:773-791
        """
        T_out = mel.shape[1] * self.spect_to_pulse_upsampling_factor
        if self.pp_subnet is not None:
            x = self._run_subnet(self.pp_subnet, params["pp_subnet"], mel)
            pulse_frequency = x[:, :, 0] * (self.pp_max_frequency - self.pp_min_frequency) + self.pp_min_frequency
            return pulse_frequency[:, :T_out]
        return jnp.ones((mel.shape[0], T_out), dtype=mel.dtype) * self.pp_max_frequency

    def _oscillate(self, params, pulse_frequency, phase_offset=None):
        """Wavetable oscillator: F0 (B, T12k) -> excitation (B, T12k, 1+sub).

        phase_offset (B,): absolute phase (mod 1) just before the first
        sample -- the carry used by chunked/sequence-parallel synthesis
        (parallel/streaming.py).

        reference: tf_wavetable.py:495-602
        """
        wt = self.wavetable
        phase = stable_cumsum_and_wrap(pulse_frequency / wt.sample_rate)
        if phase_offset is not None:
            phase = jnp.mod(phase + phase_offset[:, None], 1.0)
        if wt.use_sinusoid_as_fun or wt.add_subharm_chans:
            phase_2pi = phase * (2 * np.pi)
        if wt.use_sinusoid_as_fun:
            audio = (jnp.sin(phase_2pi) * 0.5 * (1.0 - jnp.cos(phase_2pi)))[:, :, None]
            if not wt.add_subharm_chans:
                return audio
        elif _use_pallas_oscillator():
            # fused Pallas kernel: lookup + cross-fade in VMEM (no HBM
            # materialization of the tent-weight / grid intermediates)
            from ..ops.pallas_oscillator import oscillator_fused

            audio = oscillator_fused(
                phase,
                pulse_frequency,
                params["wavetables"],
                wt.nominalF0,
                wt.F0GridFactor,
                wt.min_transposition,
                wt.max_transposition,
            )[:, :, None]
        else:
            grid = wavetable_lookup(phase, params["wavetables"])
            audio = grid_crossfade(
                grid,
                pulse_frequency,
                wt.nominalF0,
                wt.F0GridFactor,
                wt.min_transposition,
                wt.max_transposition,
            )[:, :, None]
        if wt.add_subharm_chans:
            chans = [audio]
            for ii in range(2, wt.add_subharm_chans + 2):
                chans.append(jnp.sin(phase_2pi / ii)[:, :, None])
            audio = jnp.concatenate(chans, axis=-1)
        return audio

    def oscillate_with_pulse_gains(self, params, pulse_frequency, pulse_gain_list,
                                   pulse_sync_gain_avg=False, return_gain=False,
                                   phase_offset=None):
        """Pulse-synchronous-gain oscillator call, mirroring the reference's
        `PulseWaveTable.call(..., pulse_gain_list=, return_gain=)` surface
        (tf_wavetable.py:497-600).

        Each gain contour in `pulse_gain_list` ((B, T) at the pulse sample
        rate, or None) is converted to a per-pulse-constant gain -- sampled at
        each pulse start (default, tf_wavetable.py:583-591) or averaged over
        each pulse (`pulse_sync_gain_avg`, tf_wavetable.py:642-712) -- and
        applied to the oscillator output.  Returns a list of (B, T) signals
        (None entries pass through); with return_gain, ([audio], [gains]).

        The reference builds the per-pulse gains with boolean_mask + gather
        over flattened batches; here both modes are gather-free associative
        hold scans (ops/oscillator.py) that run batched on the VPU.
        """
        from ..ops.oscillator import pulse_sync_gain_avg as _avg
        from ..ops.oscillator import pulse_sync_gain_hold as _hold

        wt = self.wavetable
        phase = stable_cumsum_and_wrap(pulse_frequency / wt.sample_rate)
        if phase_offset is not None:
            phase = jnp.mod(phase + phase_offset[:, None], 1.0)
        audio = self._oscillate(params, pulse_frequency, phase_offset=phase_offset)[:, :, 0]

        audio_list, gain_list = [], []
        for pg in pulse_gain_list:
            if pg is None:
                (gain_list if return_gain else audio_list).append(None)
                continue
            full_gain = _avg(phase, pg) if pulse_sync_gain_avg else _hold(phase, pg)
            if return_gain:
                audio_list.append(audio)
                gain_list.append(full_gain)
            else:
                audio_list.append(audio * full_gain)
        if return_gain:
            return audio_list, gain_list
        return audio_list

    def fold_pulse_channels(self, pulse_signal, noise=None, rng=None):
        """Fold the pulse-rate oscillator output to the WaveNet input rate and
        append the noise channel.

        Either a plain reshape to `pulse_channels` (x subharmonic channels) or
        a PQMF analysis split when `pulse_channels_multi_band_config` is set,
        then the sigma-scaled Gaussian noise channel.  Single source of truth
        for the channel layout -- generate_excitation and the pretraining
        stats walk both call this.

        reference: custom_pulsed_generator.py:892-906
        """
        from ..ops.pqmf_ops import pqmf_analysis

        B = pulse_signal.shape[0]
        n_sub = self.wavetable.add_subharm_chans

        if self.pulse_pqmf_filters is None:
            x = pulse_signal.reshape(B, -1, self.pulse_channels * (1 + n_sub))
        else:
            c = self.pulse_channels_multi_band_config
            x = pqmf_analysis(pulse_signal[:, :, :1], jnp.asarray(self.pulse_pqmf_filters[0]),
                              c["subbands"], c["taps"])
            if n_sub:
                x = jnp.concatenate(
                    [x, pulse_signal[:, :, 1:].reshape(B, -1, self.pulse_channels * n_sub)], axis=-1
                )

        if self.pp_mod_subnet_noise_channel_sigma:
            if noise is None:
                if rng is None:
                    rng = jax.random.PRNGKey(0)
                noise = jax.random.normal(rng, x.shape[:-1] + (1,), dtype=x.dtype)
            x = jnp.concatenate((x, self.pp_mod_subnet_noise_channel_sigma * noise), axis=-1)
        return x

    def generate_excitation(self, params, mel, pulse_frequency, mb_gain=None, noise=None, rng=None,
                            phase_offset=None):
        """Excitation waveform (B, T_mel*hop) at the output sample rate.

        reference: custom_pulsed_generator.py:886-925
        """
        from ..ops.pqmf_ops import pqmf_synthesis

        pulse_signal = self._oscillate(params, pulse_frequency, phase_offset=phase_offset)
        x = self.fold_pulse_channels(pulse_signal, noise=noise, rng=rng)

        for bl in self.pp_waveNetBlocks:
            if self.remat_wavenet_blocks:
                # rematerialize each block under grad: trades ~n_layers x
                # (B, T, n_channels) activation storage for a second forward
                # pass -- the standard TPU HBM/FLOP trade for training long
                # segments (no reference counterpart; TF keeps all
                # activations)
                x = jax.checkpoint(lambda p, xm, _bl=bl: _bl(p, xm))(params[bl.name], (x, mel))
            else:
                x = bl(params[bl.name], (x, mel))
        x = self.wn_post_net(params["wn_post_net"], x)

        if mb_gain is not None:
            x = x * mb_gain[:, : x.shape[1]]

        if self.pqmf_filters is not None:
            mb = self.multi_band_config
            y = pqmf_synthesis(x, jnp.asarray(self.pqmf_filters[1]), mb["subbands"], mb["taps"],
                               mb.get("max_band"))[:, :, 0]
        else:
            y = x.reshape(x.shape[0], x.shape[1] * x.shape[2])
        return y

    def _get_cepstral_windows(self, f0, smooth_stride):
        """F0-adaptive cepstral window per frame via table lookup.

        reference: custom_pulsed_generator.py:507-525
        """
        k = self.frequency_smoothing_kernel.shape[0]
        f0_padded = jnp.concatenate(
            (jnp.tile(f0[:, :1], (1, k // 2)), f0, jnp.tile(f0[:, -1:], (1, k // 2))), axis=1
        )
        kern = jnp.asarray(self.frequency_smoothing_kernel)[:, None, None]
        smoothed = jax.lax.conv_general_dilated(
            f0_padded[:, :, None], kern, window_strides=(smooth_stride,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :, 0]
        log10f0 = jnp.asarray(self.ps_cepstral_windows_log10f0)
        smooth_log10f0 = jnp.clip(self.log_to_log10 * jnp.log(smoothed), log10f0[0], log10f0[-1])
        ratio = (smooth_log10f0 - log10f0[0]) / (log10f0[-1] - log10f0[0])
        idx = jnp.round(ratio * (log10f0.shape[0] - 1))
        # one-hot matmul instead of a gather (30 windows; TPU gathers are
        # pathologically slow to compile -- see ops/oscillator.py note)
        onehot = (idx[..., None] == jnp.arange(log10f0.shape[0], dtype=idx.dtype)).astype(jnp.float32)
        from ..ops.precision import sensitive_matmul_precision

        windows = jnp.einsum("btn,nc->btc", onehot, jnp.asarray(self.ps_cepstral_windows),
                             precision=sensitive_matmul_precision())
        return jax.lax.stop_gradient(windows)

    def generate_specenv(self, params, mel, pulse_frequency, training=False):
        """Cepstral spectral-envelope filter (complex, (B, T_mel, fft//2+1)).

        reference: custom_pulsed_generator.py:793-855
        """
        x = self._run_subnet(self.ps_subnet, params["ps_subnet"], mel)

        aux = {}
        if self.ps_env_order_scale:
            if training or not self.psns_use_cepstral_loss_constraint:
                cepstral_windows = self._get_cepstral_windows(
                    pulse_frequency, smooth_stride=self.spect_to_pulse_upsampling_factor
                )
            if self.psns_use_cepstral_loss_constraint:
                smoothed_cepstrum = x
                if training:
                    aux["PS_cepstral_loss"] = jnp.mean(jnp.abs(x * (1 - cepstral_windows)))
            else:
                smoothed_cepstrum = x * cepstral_windows
        else:
            smoothed_cepstrum = x

        if not self.spect_filters_preserve_energy:
            # drop the gain coefficient (taken care of by the source gain)
            source_filter_cepstrum = jnp.pad(smoothed_cepstrum[:, :, 1:], ((0, 0), (0, 0), (1, 0)))
        else:
            source_filter_cepstrum = smoothed_cepstrum

        # rfft of the fft_size-padded cepstrum; only ~120 coefficients are
        # non-zero, so the rDFT evaluates them directly (matmul method rides
        # the MXU without materializing the zero padding)
        from ..ops.stft_ops import rdft

        filter_log_amp_phase = rdft(source_filter_cepstrum, self.fft_size)

        if self.filter_max_log_range:
            source_filter_stft = jnp.exp(
                self.filter_max_log_range * jnp.tanh(jnp.real(filter_log_amp_phase))
                + 1j * jnp.imag(filter_log_amp_phase)
            )
        else:
            source_filter_stft = jnp.exp(filter_log_amp_phase)

        if self.spect_filters_preserve_energy:
            filter_gain = jnp.sqrt(jnp.mean(jnp.square(jnp.abs(source_filter_stft)), axis=-1, keepdims=True))
            source_filter_stft = source_filter_stft / filter_gain.astype(source_filter_stft.dtype)
            if self.psns_gain_loss_weight and training:
                aux["PS_gain_loss"] = jnp.mean(jnp.square(filter_gain - 1 / (filter_gain + 0.001)))

        if training:
            return source_filter_stft, aux
        return source_filter_stft

    def generate_multiband_gain(self, params, mel, training=False):
        """Non-STFT alternative: per-subband gains (custom_pulsed_generator.py:857-884)."""
        x = self._run_subnet(self.ps_subnet, params["ps_subnet"], mel)
        aux = {}
        if self.spect_filters_preserve_energy:
            mean_gain = jnp.mean(x, axis=-1, keepdims=True)
            x = x - mean_gain
            if self.psns_gain_loss_weight and training:
                aux["PS_gain_loss"] = jnp.mean(jnp.abs(mean_gain))
        if training:
            return jnp.exp(x), aux
        return jnp.exp(x)

    # ----------------------------------------------------------------- call

    def __call__(self, params, mel, F0=None, training=False, return_PP=False,
                 return_components=False, rng=None, phase_offset=None, **_):
        """Full synthesis: returns (signals, PP) like the reference call
        (custom_pulsed_generator.py:556-771); training losses are handled by
        the training module."""
        pulse_frequency = self.generate_f0(params, mel)
        if F0 is not None:
            pulse_frequency_ = F0
        else:
            pulse_frequency_ = pulse_frequency

        excitation_signal = None
        padded_excitation_signal = None
        source_filter_stft = None

        if rng is None:
            rng = jax.random.PRNGKey(0)

        if (not self.ps_use_stft) or self.ps_off:
            if not self.ps_off:
                multi_band_gain = self.generate_multiband_gain(params, mel)
                multi_band_interpolated_gain = self.ps_gain_interpolator({}, multi_band_gain)
            else:
                multi_band_interpolated_gain = None
            signal = self.generate_excitation(
                params, mel, pulse_frequency_, mb_gain=multi_band_interpolated_gain, rng=rng,
                phase_offset=phase_offset,
            )
        else:
            excitation_signal = self.generate_excitation(params, mel, pulse_frequency_, rng=rng,
                                                         phase_offset=phase_offset)

        if self.ps_use_stft and (not self.ps_off):
            padded_excitation_signal = jnp.pad(
                excitation_signal,
                ((0, 0), (self.stft_win_size // 2, self.stft_win_size // 2 + self.spect_hop_size + 1)),
            )
            source_stft = stft(
                padded_excitation_signal,
                self.stft_win_size,
                self.spect_hop_size,
                self.fft_size,
                jnp.asarray(self.stft_window),
            )[:, : mel.shape[1]]

            source_filter_stft = self.generate_specenv(params, mel, pulse_frequency_, training=False)

            signal_stft = source_stft * source_filter_stft
            signal = istft(
                signal_stft,
                self.stft_win_size,
                self.spect_hop_size,
                self.fft_size,
                jnp.asarray(self.istft_window),
            )[
                :,
                self.stft_win_size // 2 : self.stft_win_size // 2
                + pulse_frequency.shape[1] * int(self.sample_rate // self.pulse_rate),
            ]

        if return_PP:
            returned_PP = [["F0", pulse_frequency[:, : signal.shape[1] : int(self.sample_rate // self.pulse_rate)]]]
            if excitation_signal is not None:
                returned_PP.append(["PSig", excitation_signal[:, : signal.shape[1]]])
            if source_filter_stft is not None:
                returned_PP.append(["PS", jnp.abs(source_filter_stft)])
        else:
            returned_PP = []
        return [signal], returned_PP

    def output_length(self, T_mel: int) -> int:
        return T_mel * self.spect_hop_size
