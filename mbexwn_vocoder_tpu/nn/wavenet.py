"""Dilated gated WaveNet stack (non-causal) with mel conditioning.

reference: MBExWN_NVoc/vocoder/model/custom_AE_layers.py:114-453 (WaveNetAE)
and :457-590 (WaveNetAEBlock).

The stack is the dominant FLOP consumer of the vocoder (dilated k=3 convs at
the internal rate x 320-340 channels).  Layout/precision choices here (NWC,
channel counts that are multiples of 128 after the gate split, folded
weight-norm at inference) exist so XLA tiles the convs onto the MXU; a fused
Pallas kernel for conv+gate+res/skip plugs in behind the same interface.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .core import Module
from .layers import Conv1DUpDownSample, Conv1DWeightNorm, LinInterpLayer


def _use_pallas_wavenet(batch: Optional[int] = None) -> bool:
    """Route the dilated gated stack through the fused Pallas kernel?

    MBEXWN_PALLAS_WN: 1/on/true forces the kernel, 0/off/false (or empty)
    forces the XLA conv path, and the default "auto" picks per traced
    program: the kernel wins at batch-1 on a real TPU (measured 13.3 vs
    15.2 ms/step at the 512-frame serving bucket, and 149 s vs 535 s cold
    compile through the remote-compile relay) but costs ~9% at batch-32
    (66.3 vs 60.4 ms), so auto uses it only for single-utterance programs.
    The kernel has no VJP: the Trainer pins the knob off in its process
    (training/trainer.py); forcing 1 is an inference-only mode like
    MBEXWN_WN_QUANT.
    """
    import os

    val = os.environ.get("MBEXWN_PALLAS_WN", "auto").strip().lower()
    if val in ("1", "on", "true"):
        return True
    if val != "auto":  # 0/off/false/empty/unknown -> conv path
        return False
    return batch == 1 and jax.default_backend() == "tpu"


def _wn_quant_mode() -> str:
    """Opt-in quantized serving mode (env-only; inference-only — rounding has
    zero gradient, so the trainer must not run under it). See ops/quant.py."""
    import os

    return os.environ.get("MBEXWN_WN_QUANT", "").strip().lower()


def _gate(activation: str, half_act: jnp.ndarray, half_sigmoid: jnp.ndarray) -> jnp.ndarray:
    """Gated units gtu/glu/gfu/gsu (custom_AE_layers.py:312-321)."""
    if activation == "gtu":
        half_act = jnp.tanh(half_act)
    elif activation == "gfu":
        half_act = half_act / (1.0 + jnp.abs(half_act))
    elif activation == "gsu":
        half_act = half_act / (1.0 + jnp.sqrt(jnp.abs(half_act)))
    # glu: identity on half_act
    return half_act * jax.nn.sigmoid(half_sigmoid)


class WaveNetAE(Module):
    """Non-causal WaveNet: start 1x1 -> n_layers dilated gated convs with
    residual+skip 1x1s -> end 1x1; mel conditioning either per-layer (one big
    conv) or via an upsampling path shared across all layers."""

    def __init__(
        self,
        n_channels: int = 256,
        n_layers: int = 12,
        kernel_size: int = 3,
        n_out_channels: Optional[int] = None,
        n_ch_groups: int = 1,
        dilation_rate_step: int = 1,
        max_log2_dilation_rate: Optional[int] = None,
        use_weight_norm: bool = True,
        use_equalized_lr: bool = False,
        activation: str = "gtu",
        padding: str = "SAME",
        disable_conditioning: bool = False,
        cond_kernel_size: int = 1,
        pre_cond_layer_channels: Union[Sequence[int], None] = None,
        cond_conv_upsampling: Optional[int] = None,
        cond_lin_upsampling: int = 1,
        compute_dtype=None,
        tp_axis: Optional[str] = None,
        name: str = "wavenet",
    ):
        assert kernel_size % 2 == 1
        assert n_channels % 2 == 0
        if activation not in ("gtu", "glu", "gfu", "gsu"):
            raise RuntimeError(f"WaveNetAE::error::unsupported wavenet activation {activation}")
        if n_out_channels is None:
            raise RuntimeError("WaveNetAE::error::n_out_channels parameter is required")
        if n_channels % n_ch_groups:
            raise RuntimeError(
                f"WaveNetAE::error::n_channels {n_channels} has to be a multiple of n_ch_groups {n_ch_groups}"
            )

        self.n_channels = n_channels
        self.n_layers = n_layers
        self.kernel_size = kernel_size
        self.n_out_channels = n_out_channels
        self.n_ch_groups = n_ch_groups
        self.n_grp_channels = n_channels // n_ch_groups
        self.dilation_rate_step = dilation_rate_step
        self.max_log2_dilation_rate = max_log2_dilation_rate
        self.use_weight_norm = use_weight_norm
        self.activation = activation
        self.padding = padding
        self.disable_conditioning = disable_conditioning
        self.cond_conv_upsampling = cond_conv_upsampling
        self.cond_lin_upsampling = cond_lin_upsampling
        # reduced-precision activations through the stack (params stay fp32;
        # the MXU accumulates fp32 either way -- bf16 halves the HBM traffic
        # of the materialized conv boundaries)
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        # tensor parallelism: mesh-axis name to shard the hidden channel dim
        # over (GSPMD sharding constraints; XLA inserts the collectives).
        # Requires an ambient mesh (jax.set_mesh) carrying this axis.
        self.tp_axis = tp_axis
        self.name = name

        conv_kw = dict(use_weight_norm=use_weight_norm, use_equalized_lr=use_equalized_lr)
        self.start = Conv1DWeightNorm(n_channels, 1, name="start", **conv_kw)
        self.end = Conv1DWeightNorm(n_out_channels, 1, name="end", **conv_kw)

        self.pre_cond_layers = [
            Conv1DWeightNorm(ch, cond_kernel_size, padding=padding, name=f"precond_{i}", **conv_kw)
            for i, ch in enumerate(pre_cond_layer_channels or [])
        ]
        self.cond_layer = None
        self.cond_lin_upsampling_layer = None
        if not disable_conditioning:
            if cond_conv_upsampling is None:
                # one conv producing a distinct 2*n_channels slab per layer
                self.cond_layer = Conv1DWeightNorm(
                    2 * n_channels * n_layers, cond_kernel_size, padding=padding, name="cond", **conv_kw
                )
            else:
                # upsampling path: sub-pixel conv then linear interp; the SAME
                # conditioning slab is shared by all layers (custom_AE_layers.py:287-290)
                self.cond_layer = Conv1DUpDownSample(
                    2 * n_channels,
                    kernel_size=cond_kernel_size,
                    factor=cond_conv_upsampling,
                    up_sample=True,
                    use_checkerboard_free_init=True,
                    padding=padding,
                    name="cond",
                    **conv_kw,
                )
                self.cond_lin_upsampling_layer = LinInterpLayer(
                    upsampling_factor=cond_lin_upsampling, num_pad_end=1, drop_last=True, name="cond_linup"
                )

        self.conv_layers: List[Conv1DWeightNorm] = []
        self.res_skip_layers: List[Conv1DWeightNorm] = []
        for index in range(n_layers):
            if max_log2_dilation_rate is not None:
                dilation = 2 ** (int(index // dilation_rate_step) % max_log2_dilation_rate)
            else:
                dilation = 2 ** int(index // dilation_rate_step)
            for i_grp in range(n_ch_groups):
                sfx = f"{index}" + (f"g{i_grp}" if i_grp else "")
                self.conv_layers.append(
                    Conv1DWeightNorm(
                        2 * self.n_grp_channels,
                        kernel_size,
                        dilation_rate=dilation,
                        padding=padding,
                        name=f"conv1D_{sfx}",
                        **conv_kw,
                    )
                )
                res_skip_ch = 2 * self.n_grp_channels if index < n_layers - 1 else self.n_grp_channels
                self.res_skip_layers.append(
                    Conv1DWeightNorm(res_skip_ch, 1, name=f"res_skip_{sfx}", **conv_kw)
                )

    def init(self, rng, in_shapes):
        audio_shape, spect_shape = in_shapes
        params = {}
        rngs = jax.random.split(rng, 4 + len(self.pre_cond_layers) + 2 * len(self.conv_layers))
        r = iter(rngs)

        p, started_shape = self.start.init(next(r), audio_shape)
        params["start"] = p

        if self.cond_layer is not None:
            cshape = spect_shape
            for ll in self.pre_cond_layers:
                p, cshape = ll.init(next(r), cshape)
                params[ll.name] = p
            p, cshape = self.cond_layer.init(next(r), cshape)
            params["cond"] = p
            if self.cond_lin_upsampling_layer is not None:
                _, cshape = self.cond_lin_upsampling_layer.init(next(r), cshape)

        grp_shape = started_shape[:-1] + (self.n_grp_channels,)
        for conv, res_skip in zip(self.conv_layers, self.res_skip_layers):
            p, mid_shape = conv.init(next(r), grp_shape)
            params[conv.name] = p
            act_shape = mid_shape[:-1] + (mid_shape[-1] // 2,)
            p, _ = res_skip.init(next(r), act_shape)
            params[res_skip.name] = p

        skip_shape = started_shape[:-1] + (self.n_channels,)
        p, out_shape = self.end.init(next(r), skip_shape)
        params["end"] = p
        return params, out_shape

    def __call__(self, params, inputs, **_):
        audio_0, spect = inputs
        in_dtype = audio_0.dtype
        if self.compute_dtype is not None:
            audio_0 = audio_0.astype(self.compute_dtype)
            spect = spect.astype(self.compute_dtype)
            params = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                params,
            )
        cd = (lambda t: t.astype(self.compute_dtype)) if self.compute_dtype is not None else (lambda t: t)
        if self.tp_axis is not None:
            from jax.sharding import PartitionSpec as _P

            _spec = _P(None, None, self.tp_axis)
            tp = lambda t: jax.lax.with_sharding_constraint(t, _spec)
        else:
            tp = lambda t: t
        started_full = tp(cd(self.start(params["start"], audio_0)))

        cond_layers = None
        if self.cond_layer is not None:
            c = spect
            for ll in self.pre_cond_layers:
                c = cd(ll(params[ll.name], c))
            c = cd(self.cond_layer(params["cond"], c))
            if self.cond_lin_upsampling_layer is not None:
                c = self.cond_lin_upsampling_layer({}, c)
                cond_layers = jnp.split(c, self.n_ch_groups, axis=-1)
            else:
                cond_layers = jnp.split(c, self.n_layers * self.n_ch_groups, axis=-1)

        # fused Pallas stack (MBEXWN_PALLAS_WN, default "auto" = batch-1 on
        # TPU): the whole dilated gated stack as 3 kernels with resident
        # weights and on-chip activations.  Measured on v5e: faster than the
        # XLA conv path at batch-1 (13.3 vs 15.2 ms) where per-layer HBM
        # round trips dominate, ~9% slower at batch-32 where both are
        # MXU-throughput-bound (see PERFORMANCE.md roofline note); compiles
        # in ~13 s vs 90-650 s for the conv stack through the remote-compile
        # relay, which matters for cold starts.  Requires the
        # shared-upsampled cond path, no channel groups, k=3, SAME padding.
        if (
            _use_pallas_wavenet(batch=started_full.shape[0])
            and self.n_ch_groups == 1
            and cond_layers is not None
            and self.cond_conv_upsampling is not None
            and self.kernel_size == 3
            and self.padding == "SAME"
            and self.activation == "gtu"  # the kernel hardcodes tanh*sigmoid
            and self.tp_axis is None  # kernel has no GSPMD partitioning rule
        ):
            skip_sum = self._fused_stack(params, started_full, cond_layers[0])
            return self.end(params["end"], skip_sum).astype(in_dtype)

        # int8 serving mode (MBEXWN_WN_QUANT=int8): per-layer dilated k=3 and
        # res/skip 1x1 convs run as int8 matmuls (2x the MXU's bf16 rate on
        # the throughput-bound stack — ops/quant.py).  Start/end/cond convs
        # stay in the compute dtype: they are <3% of the stack's FLOPs.
        quant_int8 = (
            _wn_quant_mode() == "int8"
            and self.kernel_size == 3
            and self.padding == "SAME"
        )
        if quant_int8:
            from ..ops.conv import fold_weight_norm
            from ..ops.quant import conv1x1_int8, dilated_conv1d_k3_int8

        started = list(jnp.split(started_full, self.n_ch_groups, axis=-1))
        output = [None] * self.n_ch_groups
        for index in range(self.n_layers):
            for i_grp in range(self.n_ch_groups):
                li = index * self.n_ch_groups + i_grp
                if quant_int8:
                    pcq = fold_weight_norm(params[self.conv_layers[li].name])
                    in_layered = tp(cd(dilated_conv1d_k3_int8(
                        started[i_grp], pcq["kernel"], pcq.get("b"),
                        self.conv_layers[li].dilation_rate)))
                else:
                    in_layered = tp(cd(self.conv_layers[li](params[self.conv_layers[li].name], started[i_grp])))
                if cond_layers is not None:
                    if self.cond_conv_upsampling is not None:
                        in_layered = in_layered + cond_layers[i_grp]
                    else:
                        in_layered = in_layered + cond_layers[li]
                half_act, half_sigmoid = jnp.split(in_layered, 2, axis=-1)
                activated = _gate(self.activation, half_act, half_sigmoid)
                if quant_int8:
                    prq = fold_weight_norm(params[self.res_skip_layers[li].name])
                    res_skip = tp(cd(conv1x1_int8(activated, prq["kernel"], prq.get("b"))))
                else:
                    res_skip = tp(cd(self.res_skip_layers[li](params[self.res_skip_layers[li].name], activated)))
                if index < self.n_layers - 1:
                    res, skip = jnp.split(res_skip, 2, axis=-1)
                    started[i_grp] = started[i_grp] + res
                else:
                    skip = res_skip
                output[i_grp] = skip if output[i_grp] is None else output[i_grp] + skip

        out = jnp.concatenate(output, axis=-1) if self.n_ch_groups > 1 else output[0]
        return self.end(params["end"], out).astype(in_dtype)

    def _fused_stack(self, params, started, cond_slab):
        """Assemble folded per-layer weights and run the fused Pallas stack."""
        from ..ops.conv import fold_weight_norm
        from ..ops.pallas_wavenet import fused_wavenet_stack

        dils = []
        weights = []
        for conv, rs in zip(self.conv_layers, self.res_skip_layers):
            pc = fold_weight_norm(params[conv.name])
            pr = fold_weight_norm(params[rs.name])
            wd = pc["kernel"].astype(started.dtype)
            bd = pc.get("b")
            bd = jnp.zeros((wd.shape[-1],), started.dtype) if bd is None else bd.astype(started.dtype)
            wr = pr["kernel"][0].astype(started.dtype)
            br = pr.get("b")
            br = jnp.zeros((wr.shape[-1],), started.dtype) if br is None else br.astype(started.dtype)
            dils.append(conv.dilation_rate)
            weights.append((wd, bd, wr, br))
        # interpret mode keeps the path testable on the CPU backend
        interpret = jax.default_backend() == "cpu"
        return fused_wavenet_stack(started, cond_slab, weights, dils, group_size=4,
                                   interpret=interpret)


class WaveNetAEBlock(Module):
    """WaveNetAE followed by an optional sub-pixel up/down-sampling conv."""

    def __init__(
        self,
        n_out_channels,
        n_channels=256,
        n_layers=12,
        kernel_size=3,
        dilation_rate_step=1,
        max_log2_dilation_rate=None,
        up_sample=None,
        up_down_factor=1,
        use_weight_norm=True,
        activation="gtu",
        use_equalized_lr=False,
        padding="SAME",
        disable_conditioning=False,
        n_ch_groups=1,
        cond_kernel_size: int = 1,
        cond_conv_upsampling=None,
        cond_lin_upsampling: int = 1,
        pre_cond_layer_channels=None,
        compute_dtype=None,
        tp_axis=None,
        name="wnblock",
    ):
        self.name = name
        self.up_sample = up_sample
        self.up_down_factor = up_down_factor
        self.wavenet = WaveNetAE(
            n_channels=n_channels,
            n_layers=n_layers,
            kernel_size=kernel_size,
            dilation_rate_step=dilation_rate_step,
            max_log2_dilation_rate=max_log2_dilation_rate,
            n_out_channels=n_out_channels,
            use_weight_norm=use_weight_norm,
            activation=activation,
            use_equalized_lr=use_equalized_lr,
            n_ch_groups=n_ch_groups,
            padding=padding,
            disable_conditioning=disable_conditioning,
            cond_kernel_size=cond_kernel_size,
            cond_conv_upsampling=cond_conv_upsampling,
            cond_lin_upsampling=cond_lin_upsampling,
            pre_cond_layer_channels=pre_cond_layer_channels,
            compute_dtype=compute_dtype,
            tp_axis=tp_axis,
            name=name + "_WN",
        )
        self.up_down_sample = None
        if up_sample is not None:
            self.up_down_sample = Conv1DUpDownSample(
                n_out_channels,
                kernel_size=3,
                padding=padding,
                up_sample=up_sample,
                factor=up_down_factor,
                use_weight_norm=use_weight_norm,
                name=name + "_UP",
            )

    def init(self, rng, in_shapes):
        r1, r2 = jax.random.split(rng)
        params = {}
        p, shape = self.wavenet.init(r1, in_shapes)
        params["wavenet"] = p
        if self.up_down_sample is not None:
            p, shape = self.up_down_sample.init(r2, shape)
            params["up_down"] = p
        return params, shape

    def out_length(self, in_len: int) -> int:
        if self.up_down_sample is not None:
            return self.up_down_sample.out_length(in_len)
        return in_len

    def __call__(self, params, inputs, **_):
        y = self.wavenet(params["wavenet"], inputs)
        if self.up_down_sample is not None:
            y = self.up_down_sample(params["up_down"], y)
        return y
