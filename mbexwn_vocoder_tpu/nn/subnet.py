"""CNN sub-network builder from spec lists (F0 predictor, envelope CNN).

Spec grammar (reference: custom_pulsed_generator.py:38-148):
  ["L", U]            linear-interp upsampling by U
  [ks, nf]            conv kernel ks -> nf channels (+ activation)
  [ks, nf, U]         conv + sub-pixel upsampling by U (+ activation)
  [ks, nf, "L<U>"]    conv, then linear-interp upsampling by U (+ activation)
followed by a final 1x1 conv to `final_n_channels`, an optional
missing-upsampling linear interp to reach `target_ups`, and an optional
final activation.  Padding layers mirror the reference exactly (SYMMETRIC,
or EDGE when pad_to_valid; doubled-left when causal).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from .core import Module, Sequential
from .layers import Activation, Conv1DUpDownSample, Conv1DWeightNorm, LinInterpLayer, Pad1d


def get_missing_upsampling_factor(target_ups, total_ups, base_name):
    up = target_ups // total_ups
    if total_ups * up != target_ups:
        raise RuntimeError(
            f"get_missing_upsampling_factor::error:: Upsampling to target upsampling factor "
            f"{target_ups} from {total_ups} is not possible for subnet {base_name}"
        )
    return up


class _TailFusedSequential(Sequential):
    """Sequential whose trailing [LinInterp(U), Act, Conv1x1, Act?] runs as one
    fused contraction at the *pre-interpolation* rate.

    TPU note: the unfused tail materializes three high-rate (B, T*U, C)
    tensors in HBM (interp output, activation output, conv input) just to
    reduce C channels down to `filters` — at the F0 subnet's 12 kHz pulse
    rate this tail is pure memory traffic.  Linear interpolation is a
    broadcast against the U phase weights, so the whole tail folds into one
    einsum over (…, U, C): XLA keeps the (B, T, U, C) intermediate in
    registers/VMEM and only the (B, T*U, filters) result (filters=1 for the
    F0 net) ever reaches HBM.  Parameter tree and results are identical to
    the unfused layers (tests/test_serving.py::test_fused_tail_*).
    """

    def __init__(self, layers, fused_count: int, name: str):
        super().__init__(layers, name=name)
        self.fused_count = fused_count

    def __call__(self, params, x, **kwargs):
        tail = self.layers[len(self.layers) - self.fused_count:]
        for layer in self.layers[: len(self.layers) - self.fused_count]:
            x = layer(params.get(layer.name, {}), x, **kwargs)

        interp, act, conv = tail[0], tail[1], tail[2]
        final_act = tail[3] if len(tail) > 3 else None
        U = interp.upsampling_factor
        if interp.num_pad_end > 0:
            x = jnp.concatenate([x, jnp.repeat(x[:, -1:], interp.num_pad_end, axis=1)], axis=1)
        B, T, C = x.shape
        w1 = (jnp.arange(U, dtype=x.dtype) / U)[None, None, :, None]
        z = x[:, :-1, None, :] * (1.0 - w1) + x[:, 1:, None, :] * w1  # (B, T-1, U, C)
        z = act(params.get(act.name, {}), z)
        kernel, post_gain = conv.kernel(params[conv.name])
        y = jnp.einsum("btuc,cf->btuf", z, kernel[0].astype(z.dtype),
                       preferred_element_type=jnp.float32)
        if post_gain is not None:
            y = post_gain * y
        bias = params[conv.name].get("b")
        if bias is not None:
            y = y + bias
        y = y.astype(x.dtype).reshape(B, (T - 1) * U, conv.filters)
        if not interp.drop_last:
            # interp's appended last frame feeds the (pointwise) conv too
            last = x[:, -1:, :]
            last = act(params.get(act.name, {}), last)
            yl = jnp.einsum("btc,cf->btf", last, kernel[0].astype(last.dtype),
                            preferred_element_type=jnp.float32)
            if post_gain is not None:
                yl = post_gain * yl
            if bias is not None:
                yl = yl + bias
            y = jnp.concatenate([y, yl.astype(y.dtype)], axis=1)
        if final_act is not None:
            y = final_act(params.get(final_act.name, {}), y)
        return y


def fuse_subnet_tail(seq: Sequential) -> Sequential:
    """Return a tail-fused view of `seq` when its trailing layers match
    [LinInterpLayer, Activation, 1x1 Conv1DWeightNorm, Activation?]; the
    original Sequential otherwise.  Parameters are shared either way."""
    ls = seq.layers
    n = len(ls)
    for count, pattern_end in ((4, True), (3, False)):
        if n < count:
            continue
        tail = ls[n - count:]
        interp, act, conv = tail[0], tail[1], tail[2]
        if not (isinstance(interp, LinInterpLayer) and interp.upsampling_factor > 1
                and type(act) is Activation and act.activation_function is not None
                and type(conv) is Conv1DWeightNorm and conv.kernel_size == 1
                and conv.strides == 1 and conv.dilation_rate == 1):
            continue
        if pattern_end and not (type(tail[3]) is Activation):
            continue
        return _TailFusedSequential(ls, fused_count=count, name=seq.name)
    return seq


def _pad_layer(ks, base_name, ii, force_causal, pad_to_valid):
    lo = (ks - 1) // 2 + ((ks - 1) % 2)
    hi = (ks - 1) // 2
    ptype = "EDGE" if pad_to_valid else "SYMMETRIC"
    if force_causal:
        return Pad1d(padding_size=(lo + hi, 0), padding_type=ptype, name=base_name + f"_Pad_{ii}")
    return Pad1d(padding_size=(lo, hi), padding_type=ptype, name=base_name + f"_Pad_{ii}")


def generate_subnet_from_specs(
    specs,
    base_name: str,
    final_n_channels: int,
    final_nks: Optional[int],
    final_activation: Optional[str],
    weight_init_scale: float = 0.02,
    target_ups: Optional[int] = None,
    force_causal: bool = False,
    pad_to_valid: bool = False,
    remove_inactive_pad_layers: bool = False,
    use_prelu: bool = True,
    alpha: float = 0.2,
) -> Tuple[Sequential, int]:
    """Returns (Sequential module, total upsampling factor)."""
    total_ups = 1
    layers: List[Module] = []
    default_padding = "CAUSAL" if force_causal else "SAME"

    def act(name):
        if use_prelu:
            return Activation("prelu", alpha=alpha, name=name)
        return Activation("leaky_relu", alpha=alpha, name=name)

    if specs:
        ii = 0
        for ii, spec in enumerate(specs):
            if spec[0] == "L":
                up = spec[1]
                layers.append(
                    LinInterpLayer(upsampling_factor=up, num_pad_end=1, drop_last=True,
                                   name=base_name + f"_LinUpLayer_{ii}")
                )
            else:
                ks, nf = spec[0], spec[1]
                linear_up = False
                up = 1
                if len(spec) > 2:
                    if isinstance(spec[2], str):
                        if spec[2][0] == "L":
                            linear_up = True
                        up = int(spec[2][1:])
                    else:
                        up = spec[2]

                if linear_up:
                    if (not remove_inactive_pad_layers) or ((ks - 1) // 2 + ((ks - 1) % 2)) > 0:
                        layers.append(_pad_layer(ks, base_name, ii, force_causal, pad_to_valid))
                    layers.append(
                        Conv1DWeightNorm(nf, kernel_size=ks, padding="VALID", use_weight_norm=True,
                                         kernel_init_scale=weight_init_scale,
                                         name=base_name + f"_Layer_{ii}")
                    )
                    layers.append(
                        LinInterpLayer(upsampling_factor=up, num_pad_end=1, drop_last=True,
                                       name=base_name + f"_LinUpLayer_{ii}")
                    )
                elif up > 1:
                    if pad_to_valid and (((ks - 1) // 2 + ((ks - 1) % 2)) > 0):
                        layers.append(_pad_layer(ks, base_name, ii, force_causal, True))
                    layers.append(
                        Conv1DUpDownSample(nf, kernel_size=ks,
                                           padding="VALID" if pad_to_valid else default_padding,
                                           use_weight_norm=True, factor=up, up_sample=True,
                                           use_checkerboard_free_init=True,
                                           kernel_init_scale=weight_init_scale,
                                           name=base_name + f"_Layer_{ii}")
                    )
                else:
                    if (not remove_inactive_pad_layers) or ((ks - 1) // 2 + ((ks - 1) % 2)) > 0:
                        layers.append(_pad_layer(ks, base_name, ii, force_causal, pad_to_valid))
                    layers.append(
                        Conv1DWeightNorm(nf, kernel_size=ks, padding="VALID", use_weight_norm=True,
                                         kernel_init_scale=weight_init_scale,
                                         name=base_name + f"_Layer_{ii}")
                    )
                layers.append(act(base_name + f"_ActLayer_{ii}"))
                total_ups *= up

        if final_nks is not None:
            if pad_to_valid and (((final_nks - 1) // 2 + ((final_nks - 1) % 2)) > 0):
                layers.append(_pad_layer(final_nks, base_name, ii, force_causal, True))
            layers.append(
                Conv1DWeightNorm(final_n_channels, kernel_size=final_nks,
                                 padding="VALID" if pad_to_valid else default_padding,
                                 use_weight_norm=True, kernel_init_scale=weight_init_scale,
                                 name=base_name + "_Layer_final")
            )
            if (target_ups is not None) and total_ups != target_ups:
                up = get_missing_upsampling_factor(target_ups, total_ups, base_name)
                layers.append(
                    LinInterpLayer(upsampling_factor=up, num_pad_end=1, drop_last=True,
                                   name=base_name + "_linear_interp")
                )
                total_ups *= up
            if layers and final_activation is not None:
                layers.append(Activation(activation_function=final_activation,
                                         name=base_name + "_Layer_finalAct"))

    return Sequential(layers, name=base_name), total_ups
