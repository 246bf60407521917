"""Fused Pallas WaveNet-stack kernel vs the plain XLA layer math
(interpret mode on CPU; the same kernel compiles for TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mbexwn_vocoder_tpu.ops.pallas_wavenet import fused_wavenet_group, fused_wavenet_stack


def _xla_reference(x, cond, layer_weights, dils):
    """Straightforward per-layer math (matches nn/wavenet.py's layer body)."""
    C = x.shape[-1]
    skip_total = jnp.zeros_like(x)
    for (wd, bd, wr, br), d in zip(layer_weights, dils):
        xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
        T = x.shape[1]
        y = (
            jnp.einsum("btc,cd->btd", xp[:, :T], wd[0])
            + jnp.einsum("btc,cd->btd", xp[:, d : d + T], wd[1])
            + jnp.einsum("btc,cd->btd", xp[:, 2 * d : 2 * d + T], wd[2])
            + bd
            + cond
        )
        g = jnp.tanh(y[..., :C]) * jax.nn.sigmoid(y[..., C:])
        rs = jnp.einsum("btc,cd->btd", g, wr) + br
        if rs.shape[-1] == 2 * C:
            x = x + rs[..., :C]
            skip_total = skip_total + rs[..., C:]
        else:
            skip_total = skip_total + rs
    return x, skip_total


def _make_case(rng, B=2, T=64, C=8, dils=(1, 2, 4, 8), last_skip_only=False):
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.randn(B, T, 2 * C).astype(np.float32) * 0.2)
    weights = []
    for l in range(len(dils)):
        out_rs = C if (last_skip_only and l == len(dils) - 1) else 2 * C
        weights.append((
            jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(C, out_rs).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(out_rs).astype(np.float32) * 0.05),
        ))
    return x, cond, weights


def test_fused_group_matches_xla():
    rng = np.random.RandomState(0)
    x, cond, weights = _make_case(rng)
    dils = (1, 2, 4, 8)
    x_ref, skip_ref = _xla_reference(x, cond, weights, dils)

    wd = jnp.stack([w[0] for w in weights])
    bd = jnp.stack([w[1] for w in weights])
    wr = jnp.stack([w[2] for w in weights])
    br = jnp.stack([w[3] for w in weights])
    x_out, skip_out = fused_wavenet_group(x, cond, wd, bd, wr, br, dils, interpret=True)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(skip_out), np.asarray(skip_ref), rtol=2e-5, atol=2e-5)


def test_fused_group_unaligned_cond_lanes():
    """2*C not a multiple of 128 (the VOICE flagship is C=340 -> 680 lanes):
    the cond slab must ride HBM lane-padded like x so the manual halo DMA
    stays tile-aligned."""
    rng = np.random.RandomState(2)
    dils = (1, 2, 4)
    x, cond, weights = _make_case(rng, B=1, T=64, C=12, dils=dils)  # 2C=24
    x_ref, skip_ref = _xla_reference(x, cond, weights, dils)
    wd = jnp.stack([w[0] for w in weights])
    bd = jnp.stack([w[1] for w in weights])
    wr = jnp.stack([w[2] for w in weights])
    br = jnp.stack([w[3] for w in weights])
    x_out, skip_out = fused_wavenet_group(x, cond, wd, bd, wr, br, dils, interpret=True)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(skip_out), np.asarray(skip_ref), rtol=2e-5, atol=2e-5)


def test_fused_stack_tuning_knobs(monkeypatch):
    """MBEXWN_PALLAS_GROUP / MBEXWN_PALLAS_TILE change only the schedule,
    never the result; a tile that does not divide T falls back to auto."""
    rng = np.random.RandomState(4)
    dils = (1, 2, 4, 8, 1, 2)
    x, cond, weights = _make_case(rng, B=1, T=256, C=8, dils=dils)
    ref = np.asarray(fused_wavenet_stack(x, cond, weights, dils, group_size=4, interpret=True))
    monkeypatch.setenv("MBEXWN_PALLAS_GROUP", "2")
    monkeypatch.setenv("MBEXWN_PALLAS_TILE", "64")
    got = np.asarray(fused_wavenet_stack(x, cond, weights, dils, group_size=4, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    monkeypatch.setenv("MBEXWN_PALLAS_TILE", "100")  # does not divide 256 -> auto
    got2 = np.asarray(fused_wavenet_stack(x, cond, weights, dils, group_size=4, interpret=True))
    np.testing.assert_allclose(got2, ref, rtol=2e-5, atol=2e-5)


def test_fused_stack_matches_xla_with_tiling_and_skip_only_tail():
    """12 layers in 3 groups, T split into multiple tiles, last layer
    skip-only -- the flagship configuration's structure."""
    rng = np.random.RandomState(1)
    dils = (1, 2, 4, 8, 16, 32, 64, 128, 1, 2, 4, 8)
    x, cond, weights = _make_case(rng, B=2, T=512, C=8, dils=dils, last_skip_only=True)
    _, skip_ref = _xla_reference(x, cond, weights, dils)
    skip = fused_wavenet_stack(x, cond, weights, dils, group_size=4, interpret=True)
    np.testing.assert_allclose(np.asarray(skip), np.asarray(skip_ref), rtol=5e-5, atol=5e-5)


def test_wavenet_ae_pallas_path_matches_standard(monkeypatch):
    """MBEXWN_PALLAS_WN=1 through the real WaveNetAE module == the standard
    conv path (interpret mode on CPU; same kernel compiles for TPU)."""
    from mbexwn_vocoder_tpu.nn.wavenet import WaveNetAE

    net = WaveNetAE(n_channels=16, n_layers=5, kernel_size=3, n_out_channels=8,
                    max_log2_dilation_rate=3, cond_kernel_size=3,
                    cond_conv_upsampling=2, cond_lin_upsampling=4, name="wn")
    rng = np.random.RandomState(3)
    B, T, Cin = 2, 128, 6
    audio = jnp.asarray(rng.randn(B, T, Cin).astype(np.float32) * 0.3)
    mel = jnp.asarray(rng.randn(B, T // 8, 10).astype(np.float32) * 0.3)
    params, _ = net.init(jax.random.PRNGKey(0), ((B, T, Cin), (B, T // 8, 10)))

    y_std = np.asarray(net(params, (audio, mel)))
    monkeypatch.setenv("MBEXWN_PALLAS_WN", "1")
    y_pal = np.asarray(net(params, (audio, mel)))
    np.testing.assert_allclose(y_pal, y_std, rtol=5e-4, atol=5e-5)


def test_fused_stack_bf16_close_to_fp32():
    """bf16 kernel output stays within bf16-rounding distance of fp32."""
    rng = np.random.RandomState(2)
    dils = (1, 2, 4, 8)
    x, cond, weights = _make_case(rng, B=1, T=128, C=8, dils=dils)
    _, skip_ref = _xla_reference(x, cond, weights, dils)
    wb = [tuple(jnp.asarray(w, dtype=jnp.bfloat16) for w in lw) for lw in weights]
    skip16 = fused_wavenet_stack(
        x.astype(jnp.bfloat16), cond.astype(jnp.bfloat16), wb, dils, interpret=True
    )
    rel = np.sqrt(np.mean((np.asarray(skip16, np.float32) - np.asarray(skip_ref)) ** 2)
                  / np.mean(np.asarray(skip_ref) ** 2))
    assert rel < 0.05, rel


def test_pallas_routing_auto(monkeypatch):
    """MBEXWN_PALLAS_WN routing: explicit 1/0 win; default 'auto' selects the
    fused kernel only for batch-1 programs on a real TPU backend."""
    from mbexwn_vocoder_tpu.nn import wavenet as wn

    monkeypatch.delenv("MBEXWN_PALLAS_WN", raising=False)
    # auto on the CPU backend: never
    assert wn._use_pallas_wavenet(batch=1) is False
    assert wn._use_pallas_wavenet(batch=32) is False

    # auto on a TPU backend: batch-1 only
    monkeypatch.setattr(wn.jax, "default_backend", lambda: "tpu")
    assert wn._use_pallas_wavenet(batch=1) is True
    assert wn._use_pallas_wavenet(batch=32) is False
    assert wn._use_pallas_wavenet() is False  # unknown batch -> conv

    # explicit values win in both directions
    monkeypatch.setenv("MBEXWN_PALLAS_WN", "0")
    assert wn._use_pallas_wavenet(batch=1) is False
    monkeypatch.setenv("MBEXWN_PALLAS_WN", "1")
    assert wn._use_pallas_wavenet(batch=32) is True
    monkeypatch.setenv("MBEXWN_PALLAS_WN", "")  # empty = conv (like fp32 env rule)
    assert wn._use_pallas_wavenet(batch=1) is False


def test_trainer_pins_pallas_off(monkeypatch):
    """Trainer must pin the auto routing off in its process: the fused kernel
    has no VJP, so a batch-1 grad trace selecting it would fail."""
    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.training import Trainer

    monkeypatch.delenv("MBEXWN_PALLAS_WN", raising=False)
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"]["n_channels"] = 32
    mc["pp_mod_subnet"]["n_layers"] = 2
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    Trainer(model, hp)
    import os

    assert os.environ["MBEXWN_PALLAS_WN"] == "0"
