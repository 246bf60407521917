"""Matmul/conv precision policy for numerically sensitive ops.

TPU MXU background: `jnp.matmul` / `lax.conv_general_dilated` at DEFAULT
precision truncate float32 operands to bfloat16 (one MXU pass).  That is the
right trade for the WaveNet stack (an explicit, measured design choice —
`wn_compute_dtype`), but it silently applied to EVERYTHING, including the
paths SURVEY §7 "hard parts" #8 calls out as precision-critical: the DFT
matmuls of the envelope STFT/iSTFT (ops/stft_ops.py), the wavetable tent
lookup, the cepstral-window select, the mel pseudo-inverse, and the training
losses' multi-resolution STFT bank.

That silent truncation is the root cause of the long-standing "TPU is
~1.5 dB worse than CPU at equal dtype" observation (PERFORMANCE.md "Compute
dtype" section): forcing fp32 tensors changed nothing because the matmul
units still saw bf16 operands — on CPU, fp32 matmuls are true fp32.

Policy: the sensitive sites ask `sensitive_matmul_precision()` and default
to HIGHEST (exact fp32 via multi-pass bf16 on TPU; a no-op on CPU).  These
ops are a few percent of total FLOPs, so the headline throughput cost is
small; the WaveNet conv stack keeps its own dtype-based policy.  Override
with MBEXWN_MATMUL_PRECISION=default|high|highest (e.g. `default` to A/B the
old behavior).
"""
from __future__ import annotations

import os


def sensitive_matmul_precision():
    """jax.lax.Precision for numerically sensitive matmuls (default HIGHEST)."""
    import jax

    name = (os.environ.get("MBEXWN_MATMUL_PRECISION", "") or "highest").strip().lower()
    try:
        return {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[name]
    except KeyError:
        raise ValueError(
            f"MBEXWN_MATMUL_PRECISION={name!r}: expected default|high|highest")
