"""Activation-pretraining tests: mask selection and calibration convergence."""
import numpy as np

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.training.pretrain import (
    activation_stats_loss,
    pretrainable_mask,
    pretrain_activations,
)


def _model():
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=2, T_mel=8)
    return model, params


def test_pretrainable_mask_selects_g_b_alpha():
    model, params = _model()
    mask = pretrainable_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    chosen = [jax.tree_util.keystr(p) for p, v in flat if v]
    assert all(any(k in c for k in ("'g'", "'b'", "'alpha'")) for c in chosen)
    # v kernels are NOT pretrainable
    assert not any("'v'" in c for c in chosen)
    assert len(chosen) > 10


def test_pretrain_reduces_stats_loss():
    model, params = _model()
    rng = np.random.RandomState(0)
    mels = [jnp.asarray((rng.randn(2, 8, 80) * 0.5 - 4).astype(np.float32)) for _ in range(2)]

    loss0, per_layer = activation_stats_loss(model, params, mels[0], target=1.0)
    assert np.isfinite(float(loss0)) and len(per_layer) > 5

    new_params, loss1 = pretrain_activations(model, params, mels, target=1.0, max_iters=30, lr=5e-2)
    assert loss1 < float(loss0)

    # non-pretrainable weights unchanged
    v0 = params["wn_post_net"]["v"]
    v1 = new_params["wn_post_net"]["v"]
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # gains moved
    g0 = np.asarray(params["wn_post_net"]["g"])
    g1 = np.asarray(new_params["wn_post_net"]["g"])
    assert np.abs(g0 - g1).max() > 0
