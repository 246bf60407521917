"""Linear-interpolation upsampler along the time axis.

Semantics match the reference layer (support_layers.py:30-128): input
(B, T, C) -> optionally pad `num_pad_end` copies of the last frame, linearly
interpolate by factor U, output length (T + P - 1)*U + (0 if drop_last else 1).

The reference realizes this as a fixed-weight depthwise conv2d; on TPU a
broadcasted lerp is simpler and fuses into neighbouring ops.
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_interp_upsample(
    x: jnp.ndarray, factor: int, num_pad_end: int = 0, drop_last: bool = False
) -> jnp.ndarray:
    if num_pad_end > 0:
        x = jnp.concatenate([x, jnp.repeat(x[:, -1:], num_pad_end, axis=1)], axis=1)
    B, T, C = x.shape
    if factor == 1:
        return x if drop_last else x
    # phases j/U between successive frames: out[t*U + j] = lerp(x[t], x[t+1], j/U)
    w1 = (jnp.arange(factor, dtype=x.dtype) / factor)[None, None, :, None]
    w0 = 1.0 - w1
    a = x[:, :-1, None, :]  # (B, T-1, 1, C)
    b = x[:, 1:, None, :]
    y = a * w0 + b * w1  # (B, T-1, U, C)
    y = y.reshape(B, (T - 1) * factor, C)
    if not drop_last:
        y = jnp.concatenate([y, x[:, -1:, :]], axis=1)
    return y


def linear_interp_output_length(in_len: int, factor: int, num_pad_end: int = 0, drop_last: bool = False) -> int:
    return (in_len + num_pad_end - 1) * factor + (0 if drop_last else 1)
