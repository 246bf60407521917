"""Training: full loss assembly + optax/DP train step.

The reference defines every loss and training hook but ships no trainer
(SURVEY §1: no train.py exists upstream); this module provides the trainer
the model family was designed for, idiomatically JAX:

- one jitted `train_step` (donated params/opt-state)
- data parallelism via sharding constraints over a `Mesh(('data',))`; XLA
  inserts the gradient all-reduce (psum) automatically
- teacher-forcing and loss-weight schedules as traced scalars

Training forward semantics follow PaNWaveNet.call/MBExWN.call(training=True)
(wavegen_1d.py:466-481, custom_pulsed_generator.py:556-771).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.pan_wavenet import PaNWaveNet
from ..ops.stft_ops import stft as _stft
from .losses import (
    SpectLossComponents,
    f0_pred_loss_mask,
    f0_rec_loss_mask,
    f0_prediction_loss,
    stft_coherence_loss,
)
from .schedules import ParamSchedule


@partial(jax.tree_util.register_dataclass, data_fields=("params", "opt_state", "step"), meta_fields=())
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _make_optimizer(training_config: Dict) -> optax.GradientTransformation:
    opt_cfg = training_config.get("optimizer", {}) or {}
    if isinstance(opt_cfg, str):
        opt_cfg = {"type": opt_cfg}
    lr = opt_cfg.get("learning_rate", training_config.get("learning_rate", 1e-4))
    # lr_schedule: {type: cosine|exponential|constant, warmup_steps, decay_steps, final_scale}
    sched = training_config.get("lr_schedule")
    if sched:
        stype = str(sched.get("type", "cosine")).lower()
        warmup = sched.get("warmup_steps", 0)
        decay = sched.get("decay_steps", 1_000_000)
        final = sched.get("final_scale", 0.01)
        if stype == "cosine":
            main = optax.cosine_decay_schedule(lr, decay, alpha=final)
        elif stype == "exponential":
            main = optax.exponential_decay(lr, decay, final)
        else:
            main = optax.constant_schedule(lr)
        if warmup:
            lr = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), main], [warmup]
            )
        else:
            lr = main
    opt_type = str(opt_cfg.get("type", "adam")).lower()
    if opt_type == "adam":
        tx = optax.adam(lr, b1=opt_cfg.get("beta1", 0.9), b2=opt_cfg.get("beta2", 0.999))
    elif opt_type == "adamw":
        tx = optax.adamw(lr, b1=opt_cfg.get("beta1", 0.9), b2=opt_cfg.get("beta2", 0.999),
                         weight_decay=opt_cfg.get("weight_decay", 1e-4))
    elif opt_type == "sgd":
        tx = optax.sgd(lr, momentum=opt_cfg.get("momentum", 0.9))
    else:
        raise RuntimeError(f"unknown optimizer type {opt_type}")
    clip = training_config.get("grad_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def fast_forward_opt_state(opt_state, step: int):
    """Set every optimizer-internal step counter to `step`.

    Used by the trainer CLI's --init_from warm start: a freshly init'd
    opt_state restarts its `count` fields at 0, which would replay an
    lr_schedule (and adam's bias correction) from the beginning even though
    --init_step places the run mid-timeline.  Optax states are (nested)
    namedtuples; any field literally named `count` is a step counter."""
    def _ff(st):
        if hasattr(st, "_fields"):
            if "count" in st._fields:
                st = st._replace(count=jnp.asarray(step, jnp.int32))
            return st
        if isinstance(st, tuple):
            return tuple(_ff(s) for s in st)
        return st

    return _ff(opt_state)


class Trainer:
    def __init__(self, model: PaNWaveNet, hparams: Dict, mesh=None):
        # the fused Pallas WaveNet kernel has no VJP; pin its "auto" routing
        # off for this process so a batch-1 grad trace can never select it
        # (an explicit MBEXWN_PALLAS_WN=1 export still wins -- and still
        # fails loudly under grad, like the other inference-only modes)
        import os

        os.environ.setdefault("MBEXWN_PALLAS_WN", "0")
        self.model = model
        self.hparams = hparams
        self.training_config = hparams["training_config"]
        self.preprocess_config = hparams["preprocess_config"]
        mc = model.model_config

        self.spect_losses = SpectLossComponents(self.training_config, self.preprocess_config)
        self.optimizer = _make_optimizer(self.training_config)
        self.mesh = mesh

        blk = model.block
        self.F0_down = blk.F0_down_sampling_factor
        self.pulse_rate = blk.pulse_rate
        self.pp_F0_loss_weight = None
        if mc.get("pp_F0_loss_weight") is not None:
            w = mc["pp_F0_loss_weight"]
            self.pp_F0_loss_weight = (
                ParamSchedule(name="pp_F0_loss_weight", **w) if isinstance(w, dict)
                else ParamSchedule(name="pp_F0_loss_weight", initial=w)
            )
        self.pp_F0_loss_method = mc.get("pp_F0_loss_method", "L1")
        self.pp_F0_UV_loss_weight = mc.get("pp_F0_UV_loss_weight")
        self.pred_limit = int((mc.get("pp_F0_pred_loss_limits_ms", 0.0) * self.pulse_rate) // 1000)
        self.rec_limit = int((max(mc.get("pp_F0_rec_loss_limits_ms", 0.0), 0.0) * self.pulse_rate) // 1000)
        tf_sched = mc.get("pp_teacher_forcing_schedule")
        self.teacher_forcing = (
            ParamSchedule(name="pp_teacher_forcing_schedule", **tf_sched) if tf_sched else None
        )
        self.pp_min_frequency = mc.get("pp_min_frequency", 40.0)
        self.suppress_uv_gradient = mc.get("pp_subnet_suppress_uv_gradient", False)
        self.stft_coh_loss_weight = mc.get("stft_coh_loss_weight")
        self.psns_gain_loss_weight = mc.get("psns_gain_loss_weight")
        self.psns_cepstral_loss_weight = mc.get("psns_cepstral_loss_weight", 0.5)
        self.pulse_noise_floor_mag = blk.pulse_noise_floor_mag
        # input dither (training_config:dither_level) and windowed time-domain
        # L1 loss (TD_loss_weight / TD_loss_win_len, config_utils.py:407)
        self.dither_level = self.training_config.get("dither_level", 0) or 0
        self.TD_loss_weight = self.training_config.get("TD_loss_weight", 0) or 0
        self.TD_loss_win_len = self.training_config.get("TD_loss_win_len", 512)

        self._jitted_step = None

    # ------------------------------------------------------ training forward

    def training_forward(self, params, audio, mel, F0, step, rng, F0_ds=None):
        """Training-mode forward: returns (signal, aux dict of raw losses).

        Mirrors MBExWN.call(training=True) (custom_pulsed_generator.py:556-771).
        `F0_ds` is the pulse-rate F0 target; when given it replaces the
        on-device striding of the sample-rate `F0` (the loader can then ship
        only the strided values — TPU note: the full-rate contour is 3 MB a
        batch over the ~10 MB/s relay and every sample between strides is
        discarded here anyway).
        """
        blk = self.model.block
        aux = {}

        if self.model.norm_mel_components is not None:
            grp_audio, mel_in, upsampled_rms = self.model.norm_mel_components.normalize_inputs_by_rms(
                audio[:, :, None] if audio.ndim == 2 else audio, mel
            )
            target_audio = grp_audio[:, :, 0]
        else:
            mel_in = mel
            upsampled_rms = None
            target_audio = audio if audio.ndim == 2 else audio[:, :, 0]

        pulse_frequency = blk.generate_f0(params, mel_in)

        if F0_ds is None:
            F0_ds = F0[:, :: self.F0_down] if F0 is not None else None
        pred_mask = rec_mask = None
        if F0_ds is not None:
            t = F0_ds[:, :, 0] if F0_ds.ndim == 3 else F0_ds
            pred_mask = f0_pred_loss_mask(t, self.pred_limit)
            rec_mask = f0_rec_loss_mask(t, self.rec_limit)
            if self.pp_F0_loss_weight is not None:
                aux["F0_loss"] = f0_prediction_loss(
                    pulse_frequency, t, pred_mask, method=self.pp_F0_loss_method,
                    uv_weight=self.pp_F0_UV_loss_weight, rec_mask=rec_mask,
                    min_frequency=self.pp_min_frequency,
                )

        # teacher forcing: ground-truth F0 inside confidently voiced segments
        # blended by schedule (custom_pulsed_generator.py:644-660)
        if (self.teacher_forcing is not None) and (F0_ds is not None):
            t = F0_ds[:, :, 0] if F0_ds.ndim == 3 else F0_ds
            extF0 = t * pred_mask + (1 - pred_mask) * pulse_frequency[:, : t.shape[1]]
            pad = pulse_frequency.shape[1] - extF0.shape[1]
            extF0 = jnp.concatenate(
                (extF0, extF0[:, -1:] * jnp.ones((extF0.shape[0], pad), extF0.dtype)), axis=1
            )
            w = self.teacher_forcing(step)
            pulse_frequency_ = pulse_frequency * (1 - w) + extF0 * w
            if self.suppress_uv_gradient:
                rme = jnp.concatenate(
                    (rec_mask, jnp.zeros((rec_mask.shape[0], pulse_frequency_.shape[1] - rec_mask.shape[1]),
                                         rec_mask.dtype)), axis=1)
                pulse_frequency_ = rme * pulse_frequency_ + jax.lax.stop_gradient((1 - rme) * pulse_frequency_)
        else:
            pulse_frequency_ = pulse_frequency

        rng, noise_rng, floor_rng = jax.random.split(rng, 3)
        excitation = blk.generate_excitation(params, mel_in, pulse_frequency_, rng=noise_rng)

        padded = jnp.pad(
            excitation, ((0, 0), (blk.stft_win_size // 2, blk.stft_win_size // 2 + blk.spect_hop_size + 1))
        )
        if self.pulse_noise_floor_mag is not None:
            # dither against zero magnitudes -> NaN gradients
            # (custom_pulsed_generator.py:684-690)
            padded = padded + self.pulse_noise_floor_mag * jax.random.uniform(
                floor_rng, padded.shape, minval=-1.0, maxval=1.0
            )
        source_stft = _stft(padded, blk.stft_win_size, blk.spect_hop_size, blk.fft_size,
                            jnp.asarray(blk.stft_window))[:, : mel_in.shape[1]]

        env_out = blk.generate_specenv(
            params, mel_in, jax.lax.stop_gradient(pulse_frequency_), training=True
        )
        source_filter_stft, env_aux = env_out
        aux.update(env_aux)

        signal_stft = source_stft * source_filter_stft
        from ..ops.stft_ops import istft as _istft

        sr_over_pr = int(blk.sample_rate // blk.pulse_rate)
        signal = _istft(signal_stft, blk.stft_win_size, blk.spect_hop_size, blk.fft_size,
                        jnp.asarray(blk.istft_window))[
            :, blk.stft_win_size // 2 : blk.stft_win_size // 2 + pulse_frequency.shape[1] * sr_over_pr
        ]

        if self.stft_coh_loss_weight:
            coh_stft = jax.lax.stop_gradient(source_stft) * source_filter_stft
            aux["stft_coh_loss"] = stft_coherence_loss(
                coh_stft, blk.stft_win_size, blk.spect_hop_size, blk.fft_size,
                jnp.asarray(blk.istft_window), jnp.asarray(blk.stft_window),
            )

        T = min(signal.shape[1], target_audio.shape[1])
        signal = signal[:, :T]
        if upsampled_rms is not None:
            # the loss is computed in the normalized domain against grp_audio
            pass
        return signal, target_audio[:, :T], aux

    # ------------------------------------------------------------- loss/step

    def loss_fn(self, params, batch, step, rng):
        audio, mel, F0 = batch["audio"], batch["mel"], batch.get("F0")
        # compact-upload batches (cli/train.py): fp16 halves the relay upload
        # (the training bottleneck on this runtime is host->device bandwidth,
        # not compute); losses/conditioning always run from fp32 here
        if audio.dtype != jnp.float32:
            audio = audio.astype(jnp.float32)
        if mel.dtype != jnp.float32:
            mel = mel.astype(jnp.float32)
        F0_ds = batch.get("F0_ds")
        if F0_ds is not None and F0_ds.dtype != jnp.float32:
            F0_ds = F0_ds.astype(jnp.float32)
        if self.dither_level:
            rng, d = jax.random.split(rng)
            audio = audio + self.dither_level * jax.random.normal(d, audio.shape, audio.dtype)
        signal, target_audio, aux = self.training_forward(params, audio, mel, F0, step, rng,
                                                          F0_ds=F0_ds)
        total, spect_aux = self.spect_losses.total_loss(target_audio, signal, step=step, rng=rng)
        metrics = {k: v for k, v in spect_aux.items() if v is not None}
        if self.TD_loss_weight:
            # windowed time-domain L1: compare local RMS envelopes so phase
            # mismatch does not dominate
            from ..ops.stft_ops import frame as _frame

            w = self.TD_loss_win_len
            fr_s = _frame(signal, w, w // 2)
            fr_t = _frame(target_audio, w, w // 2)
            td = jnp.mean(jnp.abs(
                jnp.sqrt(jnp.mean(jnp.square(fr_s), axis=-1) + 1e-10)
                - jnp.sqrt(jnp.mean(jnp.square(fr_t), axis=-1) + 1e-10)
            ))
            total = total + self.TD_loss_weight * td
            metrics["TD_loss"] = td
        if "F0_loss" in aux and self.pp_F0_loss_weight is not None:
            total = total + aux["F0_loss"] * self.pp_F0_loss_weight(step)
            metrics["F0_loss"] = aux["F0_loss"]
        if "PS_gain_loss" in aux and self.psns_gain_loss_weight:
            total = total + aux["PS_gain_loss"] * self.psns_gain_loss_weight
            metrics["PS_gain_loss"] = aux["PS_gain_loss"]
        if "PS_cepstral_loss" in aux and self.psns_cepstral_loss_weight:
            total = total + aux["PS_cepstral_loss"] * self.psns_cepstral_loss_weight
            metrics["PS_cepstral_loss"] = aux["PS_cepstral_loss"]
        if "stft_coh_loss" in aux and self.stft_coh_loss_weight:
            total = total + aux["stft_coh_loss"] * self.stft_coh_loss_weight
            metrics["stft_coh_loss"] = aux["stft_coh_loss"]
        metrics["total_loss"] = total
        return total, metrics

    def init_state(self, rng, T_mel: int = 32, batch_size: int = 1) -> TrainState:
        params = self.model.init(rng, batch_size=batch_size, T_mel=T_mel)
        return TrainState(params=params, opt_state=self.optimizer.init(params), step=jnp.int32(0))

    def train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, batch, state.step, rng
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics

    def jitted_train_step(self):
        """Jitted step; with a mesh, batch entries are sharded over 'data' and
        params are replicated -- XLA inserts the gradient all-reduce."""
        if self._jitted_step is not None:
            return self._jitted_step

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_sharding = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())

            def step_fn(state, batch, rng):
                batch = {k: (jax.lax.with_sharding_constraint(v, data_sharding) if v is not None else None)
                         for k, v in batch.items()}
                return self.train_step(state, batch, rng)

            self._jitted_step = jax.jit(step_fn, donate_argnums=(0,))
        else:
            self._jitted_step = jax.jit(self.train_step, donate_argnums=(0,))
        return self._jitted_step
