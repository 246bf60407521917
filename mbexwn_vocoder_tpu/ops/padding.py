"""1-D time-axis padding with CONSTANT/REFLECT/SYMMETRIC/EDGE modes.

reference: MBExWN_NVoc/vocoder/model/custom_layers.py:18-77 (TFPad1d)
"""
from __future__ import annotations

import jax.numpy as jnp


def pad1d(x: jnp.ndarray, pad_left: int, pad_right: int, mode: str = "REFLECT") -> jnp.ndarray:
    """Pad (B, T, C) along the time axis."""
    mode = mode.upper()
    cfg = ((0, 0), (pad_left, pad_right), (0, 0))
    if mode == "CONSTANT":
        return jnp.pad(x, cfg, mode="constant")
    if mode == "REFLECT":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "SYMMETRIC":
        return jnp.pad(x, cfg, mode="symmetric")
    if mode == "EDGE":
        return jnp.pad(x, cfg, mode="edge")
    raise RuntimeError(f"pad1d::error:: padding mode {mode} is not supported")
