"""Adversarial training subsystem: discriminator shapes, GAN losses, full
combined step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.training.adversarial import AdversarialTrainer
from mbexwn_vocoder_tpu.training.discriminator import (
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)


def test_discriminator_shapes_and_losses():
    d = MultiScaleDiscriminator(n_scales=3, n_layers=3, base_channels=4, max_channels=16)
    params, _ = d.init(jax.random.PRNGKey(0), (2, 2400, 1))
    real = jnp.asarray(np.random.RandomState(0).randn(2, 2400).astype(np.float32) * 0.1)
    fake = jnp.asarray(np.random.RandomState(1).randn(2, 2400).astype(np.float32) * 0.1)
    r_outs = d(params, real)
    f_outs = d(params, fake)
    assert len(r_outs) == 3
    for logits, feats in r_outs:
        assert logits.shape[-1] == 1 and len(feats) >= 3

    for method in ("lsgan", "hinge"):
        dl = discriminator_loss(r_outs, f_outs, method)
        gl = generator_adversarial_loss(f_outs, method)
        assert np.isfinite(float(dl)) and np.isfinite(float(gl))
    fm = feature_matching_loss(r_outs, f_outs)
    assert float(fm) > 0


def test_adversarial_train_step():
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    hp["wavegan_config"] = {
        "adv_loss_weight": 0.1,
        "fc_loss_weight": 2.0,
        "discriminator_config": {"loss_method": "lsgan", "n_scales": 2, "n_layers": 3,
                                 "base_channels": 4, "max_channels": 16},
    }
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    tr = AdversarialTrainer(model, hp)
    T_mel, hop = 8, 300
    state = tr.init_state(jax.random.PRNGKey(0), T_mel=T_mel, batch_size=2)

    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, T_mel * hop).astype(np.float32) * 0.1),
        "mel": jnp.asarray((rng.randn(2, T_mel, 80) * 0.5 - 4).astype(np.float32)),
        "F0": jnp.asarray((120 + 10 * rng.randn(2, T_mel * hop)).astype(np.float32)),
    }
    new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(1))
    for k in ("total_loss", "adv_loss", "fm_loss", "disc_loss", "spect_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(new_state.gen.step) == 1
    # both networks moved
    g0 = jax.tree_util.tree_leaves(state.gen.params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.gen.params)[0]
    assert np.abs(np.asarray(g0) - np.asarray(g1)).max() > 0
    d0 = jax.tree_util.tree_leaves(state.disc_params)[0]
    d1 = jax.tree_util.tree_leaves(new_state.disc_params)[0]
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() > 0


def test_wavegan_config_validator_accepts_block():
    from mbexwn_vocoder_tpu.config import check_config_dict

    hp = read_config(mv.get_config_file("SPEECH"))
    hp["wavegan_config"] = {"adv_loss_weight": 0.1}
    check_config_dict(hp)
