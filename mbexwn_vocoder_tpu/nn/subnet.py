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
