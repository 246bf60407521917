"""Map a built reference (TF) PaNWaveNet's weights onto this framework's
parameter tree.

The reference stores weight-normalized convs as (v, g, bias) with kernel
layout (width, in, out) (conv_layers.py:85-103) -- identical to this
framework's storage, so conversion is a structural walk, no transposes.
Checkpoints contain legacy dead variables from abandoned losses
(wavegen_1d.py:84-86); walking the live model object tree skips them
naturally.
"""
from __future__ import annotations

import numpy as np


def conv_params(ref_layer, jnp):
    p = {}
    if ref_layer.use_weight_norm:
        p["v"] = jnp.asarray(ref_layer.v.numpy())
        p["g"] = jnp.asarray(ref_layer.g.numpy())
    else:
        p["kernel"] = jnp.asarray(ref_layer.conv1d_layer.kernel.numpy())
    if ref_layer.conv1d_layer.use_bias:
        p["b"] = jnp.asarray(ref_layer.conv1d_layer.bias.numpy())
    return p


def subnet_params(ref_layers, our_seq, jnp):
    """Zip a reference subnet layer list with our Sequential (the two builders
    emit layers in the same order; generate_subnet_from_specs parity)."""
    params = {}
    if len(ref_layers) != len(our_seq.layers):
        raise RuntimeError(
            f"subnet structure mismatch: {[l.name for l in ref_layers]} vs "
            f"{[l.name for l in our_seq.layers]}"
        )
    for rl, ol in zip(ref_layers, our_seq.layers):
        cls = rl.__class__.__name__
        if "Conv1D" in cls:
            params[ol.name] = conv_params(rl, jnp)
        elif cls == "PReLU":
            params[ol.name] = {"alpha": jnp.asarray(rl.alpha.numpy().reshape(-1))}
    return params


def wavenet_params(ref_wn, our_wn, jnp):
    params = {"start": conv_params(ref_wn.start, jnp), "end": conv_params(ref_wn.end, jnp)}
    if ref_wn.cond_layer is not None:
        params["cond"] = conv_params(ref_wn.cond_layer, jnp)
    for rl, ol in zip(ref_wn.conv_layers, our_wn.conv_layers):
        params[ol.name] = conv_params(rl, jnp)
    for rl, ol in zip(ref_wn.res_skip_layers, our_wn.res_skip_layers):
        params[ol.name] = conv_params(rl, jnp)
    for rl, ol in zip(ref_wn.pre_cond_layers, our_wn.pre_cond_layers):
        params[ol.name] = conv_params(rl, jnp)
    return params


def pan_wavenet_params(ref_model, our_model, jnp):
    """ref_model: built reference PaNWaveNet; our_model: our PaNWaveNet."""
    blk_ref = ref_model.block
    blk = our_model.block
    params = {}
    if blk.pp_subnet is not None:
        params["pp_subnet"] = subnet_params(blk_ref.pp_subnet_layers, blk.pp_subnet, jnp)
    if getattr(blk, "ps_subnet", None) is not None:
        params["ps_subnet"] = subnet_params(blk_ref.ps_subnet_layers, blk.ps_subnet, jnp)
    if hasattr(blk_ref, "pulse_generator"):
        wt = blk_ref.pulse_generator.wavetables
        params["wavetables"] = jnp.asarray(wt.numpy() if hasattr(wt, "numpy") else np.asarray(wt))
    for rb, ob in zip(getattr(blk_ref, "pp_waveNetBlocks", []), blk.pp_waveNetBlocks):
        p = {"wavenet": wavenet_params(rb.wavenet, ob.wavenet, jnp)}
        if rb.up_down_sample is not None:
            p["up_down"] = conv_params(rb.up_down_sample, jnp)
        params[ob.name] = p
    if getattr(blk_ref, "wn_post_net", None):
        params["wn_post_net"] = conv_params(blk_ref.wn_post_net[0], jnp)
    return params
