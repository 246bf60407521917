"""Activation pretraining: calibrate weight-norm gains/biases so every conv's
pre-activation statistics hit a target scale before full training.

Capability parity with the reference's pretraining machinery
(tf2c_base_layer.py:56-109: `pretrain_activations` swaps the trainable set to
the "pretrainable" weights {g, bias, prelu alpha} and collects per-layer
activation mean / mean-abs-deviation stats; conv_layers.py:119-161).  The
reference ships the machinery but not the pretrainer; the driver here
implements the calibration the config schema describes
(pretrain_activations_target / _max_iters / _lr, config_utils.py:404-407).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

_PRETRAINABLE_LEAVES = ("g", "b", "alpha")


def pretrainable_mask(params):
    """Pytree of bools: True for the pretrainable weights {g, bias, alpha}."""

    def walk(node, key=None):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return key in _PRETRAINABLE_LEAVES

    return walk(params)


def _layer_stats(act: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(batch-wise mean, mean abs deviation) of an activation map
    (tf2c_base_layer / conv_layers: _ms_activations)."""
    axes = tuple(range(1, act.ndim))
    ma = jnp.mean(act, axis=axes, keepdims=True)
    dev = jnp.mean(jnp.abs(act - ma), axis=axes)
    return jnp.reshape(ma, (act.shape[0],)), dev


def collect_subnet_stats(seq, params, x) -> List[Tuple[str, jnp.ndarray, jnp.ndarray]]:
    """Run a Sequential capturing each conv layer's output stats."""
    stats = []
    for layer in seq.layers:
        x = layer(params.get(layer.name, {}), x)
        if layer.__class__.__name__.startswith("Conv1D"):
            m, d = _layer_stats(x)
            stats.append((layer.name, m, d))
    return stats


def collect_wavenet_stats(wn, params, inputs) -> List[Tuple[str, jnp.ndarray, jnp.ndarray]]:
    """Stats for the start/cond/dilated/res-skip/end convs of a WaveNetAE."""
    audio_0, spect = inputs
    stats = []
    started_full = wn.start(params["start"], audio_0)
    stats.append(("start", *_layer_stats(started_full)))

    cond_layers = None
    if wn.cond_layer is not None:
        c = spect
        for ll in wn.pre_cond_layers:
            c = ll(params[ll.name], c)
            stats.append((ll.name, *_layer_stats(c)))
        c = wn.cond_layer(params["cond"], c)
        stats.append(("cond", *_layer_stats(c)))
        if wn.cond_lin_upsampling_layer is not None:
            c = wn.cond_lin_upsampling_layer({}, c)
            cond_layers = jnp.split(c, wn.n_ch_groups, axis=-1)
        else:
            cond_layers = jnp.split(c, wn.n_layers * wn.n_ch_groups, axis=-1)

    started = list(jnp.split(started_full, wn.n_ch_groups, axis=-1))
    output = [None] * wn.n_ch_groups
    for index in range(wn.n_layers):
        for i_grp in range(wn.n_ch_groups):
            li = index * wn.n_ch_groups + i_grp
            conv = wn.conv_layers[li]
            in_layered = conv(params[conv.name], started[i_grp])
            stats.append((conv.name, *_layer_stats(in_layered)))
            if cond_layers is not None:
                in_layered = in_layered + (
                    cond_layers[i_grp] if wn.cond_conv_upsampling is not None else cond_layers[li]
                )
            from ..nn.wavenet import _gate

            half_act, half_sigmoid = jnp.split(in_layered, 2, axis=-1)
            activated = _gate(wn.activation, half_act, half_sigmoid)
            rs_layer = wn.res_skip_layers[li]
            res_skip = rs_layer(params[rs_layer.name], activated)
            stats.append((rs_layer.name, *_layer_stats(res_skip)))
            if index < wn.n_layers - 1:
                res, skip = jnp.split(res_skip, 2, axis=-1)
                started[i_grp] = started[i_grp] + res
            else:
                skip = res_skip
            output[i_grp] = skip if output[i_grp] is None else output[i_grp] + skip
    out = jnp.concatenate(output, axis=-1) if wn.n_ch_groups > 1 else output[0]
    out = wn.end(params["end"], out)
    stats.append(("end", *_layer_stats(out)))
    return stats


def activation_stats_loss(model, params, mel, target: float = 1.0, rng=None):
    """Sum over layers of (mean^2 + (abs_dev - target)^2)."""
    blk = model.block
    all_stats = []
    if blk.pp_subnet is not None:
        all_stats += collect_subnet_stats(blk.pp_subnet, params["pp_subnet"], mel)
    if getattr(blk, "ps_subnet", None) is not None:
        all_stats += collect_subnet_stats(blk.ps_subnet, params["ps_subnet"], mel)

    pulse_frequency = blk.generate_f0(params, mel)
    pulse_signal = blk._oscillate(params, pulse_frequency)
    x = blk.fold_pulse_channels(pulse_signal, rng=rng)
    for bl in blk.pp_waveNetBlocks:
        all_stats += collect_wavenet_stats(bl.wavenet, params[bl.name]["wavenet"], (x, mel))
        x = bl(params[bl.name], (x, mel))
    x = blk.wn_post_net(params["wn_post_net"], x)
    all_stats.append(("wn_post_net", *_layer_stats(x)))

    loss = jnp.float32(0.0)
    per_layer = {}
    for name, m, d in all_stats:
        l = jnp.mean(jnp.square(m)) + jnp.mean(jnp.square(d - target))
        per_layer[name] = l
        loss = loss + l
    return loss / max(len(all_stats), 1), per_layer


def pretrain_activations(model, params, mels, target: float = 1.0, max_iters: int = 100,
                         lr: float = 1e-2, to_rmse: float = 0.05, rng=None, verbose=False):
    """Optimize only {g, bias, alpha} until activation stats hit the target.

    mels: list/array of conditioning inputs used as calibration batches.
    Returns (params, final_loss).
    """
    mask = pretrainable_mask(params)
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform({"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def step(params, opt_state, mel, sub):
        (loss, _), grads = jax.value_and_grad(
            lambda p: activation_stats_loss(model, p, mel, target=target, rng=sub), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = np.inf
    for it in range(max_iters):
        rng, sub = jax.random.split(rng)
        mel = mels[it % len(mels)]
        params, opt_state, loss = step(params, opt_state, mel, sub)
        if verbose and it % 10 == 0:
            print(f"pretrain iter {it}: stats loss {float(loss):.4f}")
        if float(loss) < to_rmse**2:
            break
    return params, float(loss)
