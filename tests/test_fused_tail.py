"""Fused subnet tail (nn/subnet.py::fuse_subnet_tail): identical math to the
layered LinInterp -> Act -> 1x1 conv -> Act chain, same parameter tree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.nn.subnet import _TailFusedSequential, fuse_subnet_tail, generate_subnet_from_specs


def _build(specs, final_activation="soft_sigmoid", target_ups=None, use_prelu=True):
    net, ups = generate_subnet_from_specs(
        specs, base_name="T", final_n_channels=1, final_nks=1,
        final_activation=final_activation, target_ups=target_ups, use_prelu=use_prelu,
    )
    params, _ = net.init(jax.random.PRNGKey(0), (2, 16, 10))
    return net, params


@pytest.mark.parametrize("final_act,use_prelu", [("soft_sigmoid", True), (None, True), ("soft_sigmoid", False)])
def test_fused_tail_matches_layered(final_act, use_prelu):
    specs = [[3, 24, 2], [3, 12, "L5"]]
    net, params = _build(specs, final_activation=final_act, use_prelu=use_prelu)
    fused = fuse_subnet_tail(net)
    assert isinstance(fused, _TailFusedSequential)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 10).astype(np.float32))
    y0 = net(params, x)  # Sequential.__call__ on the same layer list
    y1 = fused(params, x)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-6, atol=2e-7)


def test_fused_tail_keeps_param_tree():
    net, params = _build([[3, 12, "L5"]])
    fused = fuse_subnet_tail(net)
    p2, shape = fused.init(jax.random.PRNGKey(0), (2, 16, 10))
    assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
    assert fused.out_length(16) == net.out_length(16)


def test_fused_tail_gradients_match():
    """Training runs through the same subnet object, so the fused tail must
    be gradient-equivalent to the layered path (einsum VJP vs conv VJP)."""
    net, params = _build([[3, 12, "L5"]])
    fused = fuse_subnet_tail(net)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 10).astype(np.float32))

    def loss(module):
        return lambda p: jnp.sum(module(p, x) ** 2)

    g0 = jax.grad(loss(net))(params)
    g1 = jax.grad(loss(fused))(params)
    assert jax.tree_util.tree_structure(g0) == jax.tree_util.tree_structure(g1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-5, atol=3e-6)


def test_fuse_no_match_returns_original():
    # tail ends in a missing-ups LinInterp after the final conv -> no fusion
    net, _ = _build([[3, 12, 2]], target_ups=6)
    assert fuse_subnet_tail(net) is net


def test_fused_tail_bf16_subnet_dtype(monkeypatch):
    """The reduced-precision subnet path (MBEXWN_SUBNET_DTYPE=bfloat16) runs
    the fused tail in bf16 with the same dtype contract as the layered path:
    outputs match the layered bf16 computation closely."""
    monkeypatch.setenv("MBEXWN_SUBNET_DTYPE", "bfloat16")
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["pp_mod_subnet_noise_channel_sigma"] = 0
    mc["normalize_rms_from_mell"] = False

    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    mel = jnp.asarray(np.random.RandomState(2).randn(1, 8, 80).astype(np.float32) * 0.5 - 4)
    f0_layered = np.asarray(model.block.generate_f0(params, mel))

    monkeypatch.setenv("MBEXWN_FUSED_TAIL", "1")
    fused_model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    f0_fused = np.asarray(fused_model.block.generate_f0(params, mel))
    assert f0_fused.dtype == f0_layered.dtype
    # both paths round the sigmoid output to bf16; reduction-order changes can
    # flip its last ulp (~2e-3 of the 560 Hz span after rescale), no more
    np.testing.assert_allclose(f0_fused, f0_layered, rtol=2e-3, atol=1.5)


def test_model_env_flag_full_infer(monkeypatch):
    """MBEXWN_FUSED_TAIL=1 builds a model whose end-to-end inference matches
    the default build on the same params."""
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["pp_mod_subnet_noise_channel_sigma"] = 0
    mc["normalize_rms_from_mell"] = False

    def build():
        model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
        return model

    base = build()
    params = base.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    monkeypatch.setenv("MBEXWN_FUSED_TAIL", "1")
    fused_model = build()
    assert isinstance(fused_model.block.pp_subnet, _TailFusedSequential)
    mel = jnp.asarray(np.random.RandomState(1).randn(1, 8, 80).astype(np.float32) * 0.5 - 4)
    y0 = np.asarray(base.infer(params, mel, synth_length=2400))
    y1 = np.asarray(fused_model.infer(params, mel, synth_length=2400))
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-6)
