"""int8 serving path (ops/quant.py, MBEXWN_WN_QUANT=int8).

The exactness test drives integer-representable tensors through the
tap-decomposed int8 conv so quantization is lossless and any tap/padding
misalignment shows up as a hard failure; the statistical tests bound the
quantization noise on random data.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mbexwn_vocoder_tpu.ops.conv import conv1d
from mbexwn_vocoder_tpu.ops.quant import (
    conv1x1_int8,
    dilated_conv1d_k3_int8,
    quantize_act_per_sample,
    quantize_weight_per_cout,
)


def _rel_rms(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-12)


def test_weight_quant_roundtrip_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 16, 24).astype(np.float32))
    q, s = quantize_weight_per_cout(w)
    assert q.dtype == jnp.int8 and s.shape == (24,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    # round-to-nearest: error <= scale/2 per element
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_act_quant_roundtrip_bound():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 50, 8).astype(np.float32))
    # make the two batch rows differ in loudness: per-sample scales must adapt
    x = x * jnp.asarray([1.0, 10.0])[:, None, None]
    q, s = quantize_act_per_sample(x)
    assert s.shape == (2, 1, 1)
    assert float(s[1, 0, 0]) > 5 * float(s[0, 0, 0])
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def _int_representable(rng, shape, per_channel_axis=None, per_sample=False):
    """Random tensor whose int8 quantization is exact: integer grid values
    with the extreme +127 present per quantization group (per out-channel
    for weights, per batch row for activations), so every dynamic scale is
    exactly 0.01."""
    k = rng.randint(-127, 128, size=shape).astype(np.float32)
    if per_channel_axis is not None:
        assert per_channel_axis == k.ndim - 1
        k[(0,) * (k.ndim - 1) + (slice(None),)] = 127.0
    elif per_sample:
        k[(slice(None),) + (0,) * (k.ndim - 1)] = 127.0
    else:
        k[(0,) * k.ndim] = 127.0
    return k * 0.01


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_dilated_conv_int8_exact_on_integer_grid(dilation):
    """With losslessly-quantizable operands the int8 conv must equal the fp
    conv bit-for-bit (up to fp32 dequant rounding) — catches any tap shift,
    padding offset, or scale mixup."""
    rng = np.random.RandomState(10 + dilation)
    x = jnp.asarray(_int_representable(rng, (2, 40, 6), per_sample=True))
    w = jnp.asarray(_int_representable(rng, (3, 6, 10), per_channel_axis=2))
    b = jnp.asarray(rng.randn(10).astype(np.float32) * 0.1)
    ref = conv1d(x, w, b, dilation=dilation, padding="SAME")
    got = dilated_conv1d_k3_int8(x, w, b, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv1x1_int8_exact_on_integer_grid():
    rng = np.random.RandomState(3)
    x = jnp.asarray(_int_representable(rng, (2, 40, 12), per_sample=True))
    w = jnp.asarray(_int_representable(rng, (1, 12, 8), per_channel_axis=2))
    b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    ref = conv1d(x, w, b, padding="SAME")
    got = conv1x1_int8(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dilation", [1, 4])
def test_dilated_conv_int8_noise_bound_random(dilation):
    rng = np.random.RandomState(20 + dilation)
    x = jnp.asarray(rng.randn(2, 128, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 32, 48) * 0.2).astype(np.float32))
    ref = conv1d(x, w, None, dilation=dilation, padding="SAME")
    got = dilated_conv1d_k3_int8(x, w, None, dilation=dilation)
    assert _rel_rms(got, ref) < 0.03


def test_wavenet_int8_mode_matches_fp_stack(monkeypatch):
    """The env knob routes every per-layer conv through the int8 path; the
    stack output stays statistically close to the fp stack and is
    deterministic."""
    from mbexwn_vocoder_tpu.nn.wavenet import WaveNetAE

    net = WaveNetAE(
        n_channels=16,
        n_layers=4,
        kernel_size=3,
        n_out_channels=6,
        dilation_rate_step=1,
        name="wn_q",
    )
    rng = jax.random.PRNGKey(0)
    B, T, n_mel = 2, 64, 12
    params, _ = net.init(rng, ((B, T, 3), (B, T, n_mel)))
    xr = np.random.RandomState(7)
    audio = jnp.asarray(xr.randn(B, T, 3).astype(np.float32) * 0.4)
    mel = jnp.asarray(xr.randn(B, T, n_mel).astype(np.float32))

    monkeypatch.delenv("MBEXWN_WN_QUANT", raising=False)
    y_fp = net(params, (audio, mel))
    monkeypatch.setenv("MBEXWN_WN_QUANT", "int8")
    y_q1 = net(params, (audio, mel))
    y_q2 = net(params, (audio, mel))

    assert y_q1.shape == y_fp.shape
    np.testing.assert_array_equal(np.asarray(y_q1), np.asarray(y_q2))
    # per-layer 8-bit noise through a 4-layer stack: loose statistical bound
    assert _rel_rms(y_q1, y_fp) < 0.2
    # and it must actually have taken the quantized path (outputs differ)
    assert not np.allclose(np.asarray(y_q1), np.asarray(y_fp))
