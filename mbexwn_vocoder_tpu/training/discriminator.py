"""Multi-scale waveform discriminator for adversarial vocoder training.

The reference's shipped checkpoints were trained adversarially (ADLW0.1 in
the model names, MBExWN_NVoc/__init__.py:21-31) and its config schema
validates a wavegan_config block with generator/discriminator configs and
adv/fc loss weights (config_utils.py:476-484,489-502) -- but no
discriminator implementation is shipped.  This provides the standard
multi-scale design that block implies: per scale, a stack of grouped strided
convs with LeakyReLU, returning logits plus intermediate feature maps for
the feature-matching loss.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..nn.core import Module
from ..nn.layers import Conv1DWeightNorm


class ScaleDiscriminator(Module):
    """One scale: conv stack over (B, T, 1) waveforms -> (logits, features)."""

    def __init__(self, n_layers: int = 5, base_channels: int = 16, max_channels: int = 256,
                 kernel_size: int = 15, stride: int = 4, name: str = "disc_scale"):
        self.name = name
        self.layers: List[Conv1DWeightNorm] = []
        ch = base_channels
        self.layers.append(Conv1DWeightNorm(ch, kernel_size, padding="SAME", name="pre"))
        for i in range(n_layers - 1):
            ch_out = min(ch * stride, max_channels)
            self.layers.append(
                Conv1DWeightNorm(ch_out, kernel_size, strides=stride, padding="SAME", name=f"down_{i}")
            )
            ch = ch_out
        self.post = Conv1DWeightNorm(ch, 5, padding="SAME", name="post")
        self.out = Conv1DWeightNorm(1, 3, padding="SAME", name="out")

    def init(self, rng, in_shape):
        params = {}
        shape = in_shape
        rngs = jax.random.split(rng, len(self.layers) + 2)
        for r, layer in zip(rngs, self.layers):
            p, shape = layer.init(r, shape)
            params[layer.name] = p
        p, shape = self.post.init(rngs[-2], shape)
        params["post"] = p
        p, shape = self.out.init(rngs[-1], shape)
        params["out"] = p
        return params, shape

    def __call__(self, params, x, **_):
        feats = []
        for layer in self.layers:
            x = jax.nn.leaky_relu(layer(params[layer.name], x), 0.2)
            feats.append(x)
        x = jax.nn.leaky_relu(self.post(params["post"], x), 0.2)
        feats.append(x)
        logits = self.out(params["out"], x)
        return logits, feats


def _avg_pool2(x):
    """stride-2 average pooling over time for the multi-scale pyramid."""
    T = x.shape[1] - (x.shape[1] % 2)
    x = x[:, :T]
    return 0.5 * (x[:, 0::2] + x[:, 1::2])


class MultiScaleDiscriminator(Module):
    def __init__(self, n_scales: int = 3, name: str = "msd", **scale_kwargs):
        self.name = name
        self.scales = [ScaleDiscriminator(name=f"scale_{i}", **scale_kwargs) for i in range(n_scales)]

    def init(self, rng, in_shape):
        params = {}
        for r, sc in zip(jax.random.split(rng, len(self.scales)), self.scales):
            p, _ = sc.init(r, in_shape)
            params[sc.name] = p
        return params, None

    def __call__(self, params, audio, **_):
        """audio: (B, T) -> list over scales of (logits, features)."""
        x = audio[:, :, None]
        outs = []
        for sc in self.scales:
            outs.append(sc(params[sc.name], x))
            x = _avg_pool2(x)
        return outs


# ------------------------------------------------------------------- losses


def discriminator_loss(real_outs, fake_outs, method: str = "lsgan"):
    """Per the wavegan loss_method key (check_discriminator_config)."""
    loss = jnp.float32(0.0)
    for (real_logits, _), (fake_logits, _) in zip(real_outs, fake_outs):
        if method in ("lsgan", "least_squares"):
            loss = loss + jnp.mean(jnp.square(real_logits - 1.0)) + jnp.mean(jnp.square(fake_logits))
        elif method == "hinge":
            loss = loss + jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(jax.nn.relu(1.0 + fake_logits))
        else:
            raise RuntimeError(f"unknown GAN loss method {method}")
    return loss / len(real_outs)


def generator_adversarial_loss(fake_outs, method: str = "lsgan"):
    loss = jnp.float32(0.0)
    for fake_logits, _ in fake_outs:
        if method in ("lsgan", "least_squares"):
            loss = loss + jnp.mean(jnp.square(fake_logits - 1.0))
        elif method == "hinge":
            loss = loss - jnp.mean(fake_logits)
        else:
            raise RuntimeError(f"unknown GAN loss method {method}")
    return loss / len(fake_outs)


def feature_matching_loss(real_outs, fake_outs):
    loss = jnp.float32(0.0)
    n = 0
    for (_, real_feats), (_, fake_feats) in zip(real_outs, fake_outs):
        for rf, ff in zip(real_feats, fake_feats):
            loss = loss + jnp.mean(jnp.abs(rf - ff))
            n += 1
    return loss / max(n, 1)
