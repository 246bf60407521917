"""int8 serving path for the WaveNet stack (opt-in ``MBEXWN_WN_QUANT=int8``).

The gated dilated stack is MXU-throughput-bound at flagship shapes (see
PERFORMANCE.md roofline: ~95 TFLOP/s bf16, with the fused Pallas kernel and
the XLA conv path within 4% of each other), so at a fixed model shape the
only remaining per-chip throughput lever is operand width: the TPU MXU
executes int8 x int8 -> int32 at twice its bf16 rate.

MEASURED OUTCOME (2026-08-18, v5e, flagship B=32): a negative result on
this toolchain — 79.8 ms int8 vs 58.8 ms bf16 for the stack (616x vs 816x
RT full step), +0.27 dB held-out mel-L1.  The per-sample dynamic
quantization (abs-max reduction + round/clip on the live (B,T,960) tap
tensors) is HBM-bound elementwise traffic XLA cannot fuse into the s8 dot,
and it costs more than the 2x MXU rate recovers.  The mode stays opt-in
experimental; static calibrated activation scales would be the credible
next step (delete the dynamic passes).  Numbers in PERFORMANCE.md
"int8 serving mode".

Scheme (standard dynamic post-training quantization):
- weights: symmetric per-output-channel int8 (scale = absmax / 127),
  quantized from the folded weight-norm kernel at trace time (XLA
  constant-folds it when params are closed over, and it is one cheap
  elementwise pass otherwise);
- activations: symmetric per-sample (batch-row) dynamic int8 — the abs-max
  is computed on the live tensor inside the program, so no calibration
  corpus is needed, and each utterance in a served batch gets its own scale
  (a quiet stream batched with a loud one still uses the full int8 range);
- accumulation: int32, dequantized to fp32 with the product of the two
  scales, bias added in fp32.

The dilated k=3 conv is tap-decomposed into ONE int8 matmul over a
(3*C_in) contracted dimension (three shifted time-slices concatenated on
the channel axis) rather than relying on the toolchain's s8 conv lowering;
960 contracted lanes tile the 128-lane MXU exactly.

Inference-only: rounding has zero gradient, so the trainer must never run
under this flag (the env knob is scrubbed in tests/conftest.py and is not a
config key).  Quality cost is measured, not assumed — see PERFORMANCE.md
"int8 serving mode".

No reference counterpart (the reference runs fp32 TF end to end); the
quantized stack replaces the same math as custom_AE_layers.py:273-346.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight_per_cout(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a (W, Cin, Cout)
    (or (Cin, Cout)) kernel. Returns (int8 kernel, fp32 scale per Cout)."""
    k32 = kernel.astype(jnp.float32)
    red_axes = tuple(range(k32.ndim - 1))
    amax = jnp.max(jnp.abs(k32), axis=red_axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act_per_sample(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-sample dynamic int8 quantization of (B, ...) activations.
    Returns (int8 tensor, fp32 scale broadcastable against x)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=tuple(range(1, x32.ndim)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_matmul(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """(B, T, K) int8 @ (K, Cout) int8 -> (B, T, Cout) int32 on the MXU."""
    return jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def conv1x1_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1x1 conv over (B, T, Cin) with kernel (1, Cin, Cout) or (Cin, Cout),
    int8 operands, int32 accumulation, fp32 output."""
    if kernel.ndim == 3:
        kernel = kernel[0]
    xq, sx = quantize_act_per_sample(x)
    wq, sw = quantize_weight_per_cout(kernel)
    y = _int8_matmul(xq, wq).astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def dilated_conv1d_k3_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dilation: int = 1,
) -> jnp.ndarray:
    """SAME-padded dilated k=3 conv over (B, T, Cin), kernel (3, Cin, Cout),
    as one int8 matmul with a (3*Cin) contracted dimension.

    Equivalent fp math: y[t] = sum_k x[t + (k-1)*d] @ W[k] with zero padding
    (same taps as ops/conv.py:conv1d with padding="SAME", k_eff = 2d+1,
    lo = hi = d).  The input is quantized ONCE (per sample) and the three
    taps are strided slices of the same padded int8 buffer, so the quantized
    conv is exactly the int8 matmul of the concatenated taps.
    """
    if kernel.shape[0] != 3:
        raise ValueError(f"dilated_conv1d_k3_int8 requires kernel width 3, got {kernel.shape[0]}")
    B, T, Cin = x.shape
    d = int(dilation)
    xq, sx = quantize_act_per_sample(x)
    wq, sw = quantize_weight_per_cout(kernel)
    xp = jnp.pad(xq, ((0, 0), (d, d), (0, 0)))
    taps = jnp.concatenate(
        [
            jax.lax.dynamic_slice_in_dim(xp, k * d, T, axis=1)
            for k in range(3)
        ],
        axis=-1,
    )  # (B, T, 3*Cin)
    wcat = wq.reshape(3 * Cin, -1)  # taps stack on the contracted axis
    y = _int8_matmul(taps, wcat).astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y
