"""1-D convolution primitives (NWC layout, WIO kernels) for TPU.

Conventions:
- activations are (batch, time, channels) -- the natural layout for XLA's
  TPU conv lowering (time x channels maps onto the MXU as a matmul with the
  kernel taps unrolled)
- kernels are (width, in_channels, out_channels), identical to the reference
  checkpoints' layout so converted weights drop in without transposition
  (reference kernel layout: tf_keras Conv1D, conv_layers.py:60-66)

Weight-normalized kernels are stored as (v, g) pairs exactly like the
reference (conv_layers.py:85-103); `fold_weight_norm` bakes them into a plain
kernel for inference (the per-call recompute at conv_layers.py:149-153 is a
training-time need only).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_DN = ("NWC", "WIO", "NWC")


def same_pads(kernel_size: int, dilation: int = 1, stride: int = 1, in_len: Optional[int] = None) -> Tuple[int, int]:
    """TF-compatible SAME padding (lo, hi) for a 1-D conv."""
    k_eff = (kernel_size - 1) * dilation + 1
    if stride == 1:
        total = k_eff - 1
    else:
        if in_len is None:
            raise ValueError("SAME padding with stride > 1 requires the input length")
        out_len = -(-in_len // stride)
        total = max(0, (out_len - 1) * stride + k_eff - in_len)
    lo = total // 2
    return lo, total - lo


def causal_pads(kernel_size: int, dilation: int = 1) -> Tuple[int, int]:
    k_eff = (kernel_size - 1) * dilation + 1
    return k_eff - 1, 0


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_reduced_precision(x, kernel, stride, dilation, pads):
    """bf16-operand conv surfacing the MXU's fp32 accumulation as fp32 output.

    The stock transpose rule of a conv whose `preferred_element_type` differs
    from its operand dtype builds a transpose conv mixing the fp32 cotangent
    with the bf16 kernel, which `lax.conv_general_dilated` rejects — so the
    reduced-precision compute modes would be forward-only.  This custom VJP
    keeps the fp32-accumulated forward and runs the two backward convs in the
    operand dtype (the TPU MXU accumulates bf16 products in fp32 internally
    regardless; only the cotangent round-trips through bf16, the standard
    mixed-precision contract)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=list(pads),
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )


def _conv_reduced_precision_fwd(x, kernel, stride, dilation, pads):
    return _conv_reduced_precision(x, kernel, stride, dilation, pads), (x, kernel)


def _conv_reduced_precision_bwd(stride, dilation, pads, res, ct):
    x, kernel = res

    def same_dtype_conv(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, window_strides=(stride,), padding=list(pads),
            rhs_dilation=(dilation,), dimension_numbers=_DN,
        )

    _, vjp = jax.vjp(same_dtype_conv, x, kernel)
    return vjp(ct.astype(x.dtype))


_conv_reduced_precision.defvjp(_conv_reduced_precision_fwd, _conv_reduced_precision_bwd)


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "SAME",
) -> jnp.ndarray:
    """Conv over (B, T, Cin) with kernel (W, Cin, Cout)."""
    if padding == "SAME":
        pads = [same_pads(kernel.shape[0], dilation, stride, x.shape[1])]
    elif padding == "CAUSAL":
        pads = [causal_pads(kernel.shape[0], dilation)]
    elif padding == "VALID":
        pads = [(0, 0)]
    else:
        raise ValueError(f"unsupported padding {padding}")
    if x.dtype == jnp.float32:
        # fp32 mode means TRUE fp32: at DEFAULT precision the TPU MXU would
        # truncate fp32 operands to bf16 anyway, making the fp32/bf16 modes
        # numerically identical on TPU (the round-4 "no dtype cost" finding
        # was exactly this).  See ops/precision.py.
        from .precision import sensitive_matmul_precision

        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride,),
            padding=pads,
            rhs_dilation=(dilation,),
            dimension_numbers=_DN,
            preferred_element_type=x.dtype,
            precision=sensitive_matmul_precision(),
        )
    else:
        y = _conv_reduced_precision(x, kernel, stride, dilation,
                                    tuple(tuple(p) for p in pads))
    if bias is not None:
        y = y + bias
    return y


def weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """kernel = g * v / ||v||_2 with the norm over (width, in) per out-channel.

    reference: conv_layers.py:149-153 (tf.nn.l2_normalize uses eps 1e-12)
    """
    norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True), 1e-12))
    return g * (v / norm)


def equalized_lr_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """kernel = g * v / rms(v) (equalized-LR variant, conv_layers.py:150-151)."""
    rms = jnp.sqrt(jnp.mean(jnp.square(v), axis=(0, 1), keepdims=True))
    return g * (v / rms)


def fold_weight_norm(params: dict) -> dict:
    """Recursively replace {v, g} pairs by a folded {kernel} in a param tree."""
    if isinstance(params, dict):
        if "v" in params and "g" in params:
            out = {k: vv for k, vv in params.items() if k not in ("v", "g")}
            if params.get("_equalized_lr", False):
                out["kernel"] = equalized_lr_kernel(params["v"], params["g"])
            else:
                out["kernel"] = weight_norm_kernel(params["v"], params["g"])
            out.pop("_equalized_lr", None)
            return out
        return {k: fold_weight_norm(vv) for k, vv in params.items()}
    return params
