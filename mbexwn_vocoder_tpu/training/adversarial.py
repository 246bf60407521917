"""Adversarial trainer: generator (MBExWN) + multi-scale discriminator.

Implements the wavegan_config contract the reference validates
(config_utils.py:476-484): adv_loss_weight, fc_loss_weight,
disable_discriminator, discriminator loss_method; composes on top of the
spectral-loss Trainer (the usual recipe: spectral pretraining, then
adversarial fine-tuning with feature matching).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .discriminator import (
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)
from .trainer import Trainer, TrainState


@partial(jax.tree_util.register_dataclass,
         data_fields=("gen", "disc_params", "disc_opt_state"), meta_fields=())
@dataclass
class GANTrainState:
    gen: TrainState
    disc_params: Any
    disc_opt_state: Any


class AdversarialTrainer:
    def __init__(self, model, hparams: Dict, mesh=None):
        self.base = Trainer(model, hparams, mesh=mesh)
        wg = hparams.get("wavegan_config", {}) or {}
        self.adv_loss_weight = wg.get("adv_loss_weight", 0.1)
        self.fc_loss_weight = wg.get("fc_loss_weight", 10.0)
        self.disable_discriminator = wg.get("disable_discriminator", False)
        disc_cfg = dict(wg.get("discriminator_config", {}) or {})
        self.loss_method = disc_cfg.pop("loss_method", "lsgan")
        disc_cfg.pop("n_group", None)
        disc_cfg.pop("activation", None)
        self.discriminator = MultiScaleDiscriminator(**disc_cfg)
        lr = wg.get("discriminator_lr", 2e-4)
        self.disc_tx = optax.adam(lr, b1=0.5, b2=0.9)
        self.mesh = mesh

    def init_state(self, rng, T_mel: int = 32, batch_size: int = 2) -> GANTrainState:
        r1, r2 = jax.random.split(rng)
        gen = self.base.init_state(r1, T_mel=T_mel, batch_size=batch_size)
        hop = self.base.preprocess_config["hop_size"]
        disc_params, _ = self.discriminator.init(r2, (batch_size, T_mel * hop, 1))
        return GANTrainState(gen=gen, disc_params=disc_params,
                             disc_opt_state=self.disc_tx.init(disc_params))

    # --------------------------------------------------------------- steps

    def _gen_loss(self, params, disc_params, batch, step, rng):
        total, metrics = self.base.loss_fn(params, batch, step, rng)
        if not self.disable_discriminator:
            signal, target, _ = self.base.training_forward(
                params, batch["audio"], batch["mel"], batch.get("F0"), step, rng
            )
            fake_outs = self.discriminator(disc_params, signal)
            real_outs = self.discriminator(disc_params, jax.lax.stop_gradient(target))
            adv = generator_adversarial_loss(fake_outs, self.loss_method)
            fm = feature_matching_loss(real_outs, fake_outs)
            total = total + self.adv_loss_weight * adv + self.fc_loss_weight * fm
            metrics = dict(metrics, adv_loss=adv, fm_loss=fm, total_loss=total)
        return total, metrics

    def _disc_loss(self, disc_params, gen_params, batch, step, rng):
        signal, target, _ = self.base.training_forward(
            gen_params, batch["audio"], batch["mel"], batch.get("F0"), step, rng
        )
        fake_outs = self.discriminator(disc_params, jax.lax.stop_gradient(signal))
        real_outs = self.discriminator(disc_params, target)
        return discriminator_loss(real_outs, fake_outs, self.loss_method)

    def train_step(self, state: GANTrainState, batch, rng) -> Tuple[GANTrainState, Dict]:
        r_d, r_g = jax.random.split(rng)
        gen = state.gen
        if not self.disable_discriminator:
            d_loss, d_grads = jax.value_and_grad(self._disc_loss)(
                state.disc_params, gen.params, batch, gen.step, r_d
            )
            d_updates, disc_opt_state = self.disc_tx.update(d_grads, state.disc_opt_state, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, d_updates)
        else:
            d_loss = jnp.float32(0.0)
            disc_params, disc_opt_state = state.disc_params, state.disc_opt_state

        (g_loss, metrics), g_grads = jax.value_and_grad(self._gen_loss, has_aux=True)(
            gen.params, disc_params, batch, gen.step, r_g
        )
        updates, opt_state = self.base.optimizer.update(g_grads, gen.opt_state, gen.params)
        params = optax.apply_updates(gen.params, updates)
        new_gen = TrainState(params=params, opt_state=opt_state, step=gen.step + 1)
        metrics = dict(metrics, disc_loss=d_loss)
        return GANTrainState(gen=new_gen, disc_params=disc_params, disc_opt_state=disc_opt_state), metrics

    def jitted_train_step(self):
        return jax.jit(self.train_step, donate_argnums=(0,))
