"""Core layers: weight-norm conv, sub-pixel up/down conv, linear-interp
upsampler, padding, activations.

reference anchors:
- TF2C_Conv1DWeightNorm        tf2_components/layers/conv_layers.py:21-174
- TF2C_Conv1DUpDownSample      tf2_components/layers/conv_layers.py:177-267
- TF2C_LinInterpLayer          tf2_components/layers/support_layers.py:30-128
- TFPad1d                      custom_layers.py:18-77
- ActivationLayer              custom_AE_layers.py:21-109
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv1d, weight_norm_kernel, equalized_lr_kernel
from ..ops.interp import linear_interp_upsample, linear_interp_output_length
from ..ops.padding import pad1d
from .core import Module


def _glorot_uniform(rng, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1]
    fan_out = shape[0] * shape[2]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


class Conv1DWeightNorm(Module):
    """Conv1D with optional weight normalization / equalized LR.

    Parameters are stored as {v, g, b} matching the reference's checkpoint
    decomposition (conv_layers.py:85-103); at inference `fold_weight_norm`
    bakes them into {kernel, b}.
    """

    def __init__(
        self,
        filters: int,
        kernel_size: int,
        strides: int = 1,
        dilation_rate: int = 1,
        padding: str = "SAME",
        use_weight_norm: bool = True,
        use_equalized_lr: bool = False,
        use_bias: bool = True,
        kernel_init_scale: Optional[float] = None,  # None -> glorot uniform
        no_cb_for_up_fac: int = 0,
        name: str = "conv",
    ):
        self.filters = filters
        self.kernel_size = kernel_size
        self.strides = strides
        self.dilation_rate = dilation_rate
        self.padding = padding.upper()
        self.use_weight_norm = use_weight_norm
        self.use_equalized_lr = use_equalized_lr
        self.use_bias = use_bias
        self.kernel_init_scale = kernel_init_scale
        self.no_cb_for_up_fac = no_cb_for_up_fac
        self.name = name

    def init(self, rng, in_shape):
        in_ch = in_shape[-1]
        kshape = (self.kernel_size, in_ch, self.filters)
        if self.kernel_init_scale is not None:
            kernel = self.kernel_init_scale * jax.random.normal(rng, kshape)
        else:
            kernel = _glorot_uniform(rng, kshape)

        if self.no_cb_for_up_fac:
            # checkerboard-free init: average kernels across the sub-pixel
            # groups so all phases start identical (conv_layers.py:73-77,
            # after Aitken et al., arXiv:1707.02937)
            f = self.no_cb_for_up_fac
            kernel = jnp.reshape(
                jnp.tile(
                    jnp.mean(jnp.reshape(kernel, kshape[:2] + (f, self.filters // f)), axis=-2, keepdims=True),
                    (1, 1, f, 1),
                ),
                kshape,
            )

        params = {}
        if self.use_weight_norm:
            if self.use_equalized_lr:
                g_val = jnp.sqrt(jnp.mean(jnp.square(kernel)))
                g = jnp.ones((self.filters,)) * g_val
                v = kernel / g
                params["_equalized_lr"] = True
            else:
                g = jnp.linalg.norm(jnp.reshape(kernel, (-1, self.filters)), axis=0)
                v = kernel
            params.update(v=v, g=g)
        elif self.use_equalized_lr:
            ini_std = jnp.sqrt(jnp.mean(jnp.square(kernel)))
            params.update(kernel=kernel / ini_std, g=jnp.ones((self.filters,)) * ini_std)
        else:
            params["kernel"] = kernel
        if self.use_bias:
            params["b"] = jnp.zeros((self.filters,))

        out_t = self._out_t(in_shape[-2])
        return params, in_shape[:-2] + (out_t, self.filters)

    def _out_t(self, t):
        if t is None:
            return None
        if self.padding in ("SAME", "CAUSAL"):
            return -(-t // self.strides)
        k_eff = (self.kernel_size - 1) * self.dilation_rate + 1
        return (t - k_eff) // self.strides + 1

    def out_length(self, in_len: int) -> int:
        return self._out_t(in_len)

    def kernel(self, params):
        if "kernel" in params:
            if "g" in params:  # unfolded equalized-lr without weight norm
                return params["kernel"], params["g"]
            return params["kernel"], None
        if params.get("_equalized_lr", False):
            return equalized_lr_kernel(params["v"], params["g"]), None
        return weight_norm_kernel(params["v"], params["g"]), None

    def __call__(self, params, x, **_):
        kernel, post_gain = self.kernel(params)
        bias = params.get("b")
        if post_gain is not None:
            y = conv1d(x, kernel, None, self.strides, self.dilation_rate, self.padding)
            y = post_gain * y
            if bias is not None:
                y = y + bias
            return y.astype(x.dtype)
        # conv1d accumulates in fp32 (preferred_element_type); cast back so a
        # reduced-precision stack (MBEXWN_SUBNET_DTYPE) keeps bf16 activations
        # flowing between layers.  No-op in the default fp32 path.
        return conv1d(x, kernel, bias, self.strides, self.dilation_rate, self.padding).astype(x.dtype)


class Conv1DUpDownSample(Conv1DWeightNorm):
    """Sub-pixel up/down-sampling conv (depth<->time reshape).

    up:   B x T x Cin -> conv to filters*factor -> B x T*factor x filters
    down: B x T x Cin -> conv to filters/factor -> B x T/factor x filters
    reference: conv_layers.py:177-267
    """

    def __init__(self, filters, kernel_size=3, up_sample=None, factor=2,
                 use_checkerboard_free_init=False, name="convUD", **kwargs):
        self.up_sample = up_sample
        self.factor = factor
        self.out_filters = filters
        self.down_sample = (up_sample is not None) and (not up_sample)
        if use_checkerboard_free_init and not up_sample:
            raise RuntimeError("use_checkerboard_free_init requires up_sample")
        if self.down_sample and factor * (filters // factor) != filters:
            raise RuntimeError(f"filters {filters} is not a multiple of factor {factor}")
        internal = filters * factor if up_sample else (filters // factor if self.down_sample else filters)
        super().__init__(
            filters=internal,
            kernel_size=kernel_size,
            no_cb_for_up_fac=factor if (use_checkerboard_free_init and up_sample) else 0,
            name=name,
            **kwargs,
        )

    def init(self, rng, in_shape):
        params, shape = super().init(rng, in_shape)
        return params, in_shape[:-2] + (self.out_length(in_shape[-2]), self.out_filters)

    def out_length(self, in_len: int) -> int:
        t = super().out_length(in_len)
        if self.up_sample:
            return t * self.factor
        if self.down_sample:
            return t // self.factor
        return t

    def __call__(self, params, x, **_):
        y = super().__call__(params, x)
        B, T, C = y.shape
        if self.up_sample:
            return y.reshape(B, T * self.factor, C // self.factor)
        if self.down_sample:
            return y.reshape(B, T // self.factor, C * self.factor)
        return y


class LinInterpLayer(Module):
    """Fixed linear-interpolation upsampler (no parameters)."""

    def __init__(self, upsampling_factor, num_pad_end=0, drop_last=False, name="lininterp"):
        self.upsampling_factor = upsampling_factor
        self.num_pad_end = num_pad_end
        self.drop_last = drop_last
        self.name = name

    def init(self, rng, in_shape):
        return {}, in_shape[:-2] + (self.out_length(in_shape[-2]), in_shape[-1])

    def out_length(self, in_len: int) -> int:
        return linear_interp_output_length(in_len, self.upsampling_factor, self.num_pad_end, self.drop_last)

    def __call__(self, params, x, **_):
        return linear_interp_upsample(x, self.upsampling_factor, self.num_pad_end, self.drop_last)


class Pad1d(Module):
    def __init__(self, padding_size, padding_type="REFLECT", name="pad"):
        try:
            self.padding_size = (padding_size[0], padding_size[1])
        except (IndexError, TypeError):
            self.padding_size = (padding_size, padding_size)
        self.padding_type = padding_type.upper()
        self.name = name

    def init(self, rng, in_shape):
        return {}, in_shape[:-2] + (self.out_length(in_shape[-2]), in_shape[-1])

    def out_length(self, in_len: int) -> int:
        return in_len + self.padding_size[0] + self.padding_size[1]

    def __call__(self, params, x, **_):
        return pad1d(x, self.padding_size[0], self.padding_size[1], self.padding_type)


def soft_sigmoid(x):
    """x -> 0.5 + 0.5*x/(1+|x|)  (custom_AE_layers.py:91-99)"""
    return 0.5 + 0.5 * x / (1.0 + jnp.abs(x))


def soft_sqrt(x):
    """x -> x/(1+sqrt(|x|))  (custom_AE_layers.py:81-89)"""
    return x / (1.0 + jnp.sqrt(jnp.abs(x)))


_STATLESS_ACTIVATIONS = {
    "linear": lambda x: x,
    None: lambda x: x,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "soft_sign": jax.nn.soft_sign,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "soft_sigmoid": soft_sigmoid,
    "soft_sqrt": soft_sqrt,
    "exp": jnp.exp,
    "relu": jax.nn.relu,
}


class Activation(Module):
    """Named stateless activation (custom_AE_layers.py:21-109)."""

    def __init__(self, activation_function=None, alpha=0.2, name="act"):
        self.activation_function = activation_function.lower() if activation_function else activation_function
        self.alpha = alpha
        self.name = name
        if self.activation_function == "leaky_relu":
            self.fn = lambda x: jax.nn.leaky_relu(x, negative_slope=alpha)
        elif self.activation_function in _STATLESS_ACTIVATIONS:
            self.fn = _STATLESS_ACTIVATIONS[self.activation_function]
        elif self.activation_function == "prelu":
            self.fn = None  # parametric, handled below
        else:
            raise RuntimeError(f"Activation::error::unknown activation {activation_function}")

    def init(self, rng, in_shape):
        if self.activation_function == "prelu":
            return {"alpha": jnp.full((in_shape[-1],), self.alpha)}, in_shape
        return {}, in_shape

    def __call__(self, params, x, **_):
        if self.activation_function == "prelu":
            return jnp.maximum(x, 0.0) + params["alpha"] * jnp.minimum(x, 0.0)
        return self.fn(x)


class PReLU(Activation):
    """PReLU with per-channel alpha shared over time (keras shared_axes=[1])."""

    def __init__(self, alpha=0.2, name="prelu"):
        super().__init__("prelu", alpha=alpha, name=name)


class LeakyReLU(Activation):
    def __init__(self, alpha=0.2, name="lrelu"):
        super().__init__("leaky_relu", alpha=alpha, name=name)
