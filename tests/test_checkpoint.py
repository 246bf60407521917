"""Checkpoint tests: weights.tf conversion round trip and native npz IO."""
import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config, dump_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.compat.params_io import save_params, load_params

from .reference_oracle import require_reference


def _small_hp():
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"]["n_channels"] = 16
    mc["pp_mod_subnet"]["n_layers"] = 2
    mc["pp_mod_subnet"]["n_out_channels"] = 8
    mc["pp_mod_subnet_noise_channel_sigma"] = 0.0
    mc["normalize_rms_from_mell"] = False
    return hp


def test_params_npz_roundtrip(tmp_path):
    hp = _small_hp()
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    path = str(tmp_path / "weights.npz")
    save_params(path, params)
    restored = load_params(path)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_params_npz_fp16_distribution_roundtrip(tmp_path):
    """Distribution format (tools/publish_model.py): fp16 + compressed on
    disk, fp32 master params restored at load, rel error < 2^-10."""
    hp = _small_hp()
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    path = str(tmp_path / "weights.npz")
    save_params(path, params, dtype=np.float16, compressed=True)
    restored = load_params(path)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        va, vb = np.asarray(va), np.asarray(vb)
        if np.issubdtype(va.dtype, np.floating):
            assert vb.dtype == np.float32
            scale = max(1e-6, float(np.max(np.abs(va))))
            assert float(np.max(np.abs(va - vb))) / scale < 2 ** -10
        else:
            np.testing.assert_array_equal(va, vb)


def test_params_npz_native_fp16_leaves_roundtrip_exact(tmp_path):
    """A tree that legitimately contains fp16 leaves, saved WITHOUT the
    distribution downcast, round-trips bit-exactly (the downcast marker is an
    explicit sidecar key, not inferred from dtype)."""
    tree = {
        "a": {"w": np.random.RandomState(0).randn(4, 3).astype(np.float16)},
        "b": np.float32([1.5, -2.25]),
        "c": np.arange(5, dtype=np.int32),
    }
    path = str(tmp_path / "w.npz")
    save_params(path, tree)
    restored = load_params(path)
    assert restored["a"]["w"].dtype == np.float16
    np.testing.assert_array_equal(restored["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(restored["b"], tree["b"])
    np.testing.assert_array_equal(restored["c"], tree["c"])


def test_weights_tf_conversion_roundtrip(tmp_path):
    """Save a reference model's weights.tf, convert via convert_model_dir,
    load through MELInverter, and check output parity vs the TF model."""
    require_reference()
    import tensorflow as tf
    from MBExWN_NVoc.vocoder.model.models import create_model as ref_create_model

    from mbexwn_vocoder_tpu.compat.tf_checkpoint import convert_model_dir
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    hp = _small_hp()
    hp_ref = copy.deepcopy(hp)
    hp_ref["mbexwn_config"]["wavetable_config"]["trainable"] = False
    hp_ref["mbexwn_config"].pop("remat_wavenet_blocks", None)
    hp_ref["mbexwn_config"].pop("wn_compute_dtype", None)
    hp_ref["mbexwn_config"].pop("subnet_compute_dtype", None)

    tf.random.set_seed(1)
    ref_model, _ = ref_create_model(hp_ref, hp_ref["training_config"], hp_ref["preprocess_config"],
                                    quiet=True, use_tf25_compatible_implementation=True)
    ref_model.build_model(variable_time_dim=True)

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    ref_model.save_weights(os.path.join(model_dir, "weights.tf"))
    # the converter instantiates the reference model from config.yaml; pin the
    # wavetable trainable flag there too (modern keras rejects None)
    dump_config(os.path.join(model_dir, "config.yaml"), hp_ref)

    out = convert_model_dir(model_dir)
    assert out.endswith("weights.npz") and os.path.exists(out)

    inv = MELInverter(model_dir)
    rng = np.random.RandomState(0)
    T_mel = 10
    mel = (rng.randn(1, T_mel, 80) * 0.5 - 4.0).astype(np.float32)
    y = np.asarray(inv.model.infer(inv.params, jnp.asarray(mel), synth_length=T_mel * 300))
    y_ref = ref_model.infer(mel, synth_length=T_mel * 300).numpy()
    rel = np.sqrt(np.mean((y - y_ref) ** 2) / (np.mean(y_ref**2) + 1e-12))
    assert rel < 3e-3, rel


def test_weights_tf_conversion_skips_legacy_dead_variables(tmp_path):
    """The reference's published checkpoints carry variables from abandoned
    training trials that the inference graph never builds (wavegen_1d.py:84-91
    'present in the checkpoints').  Inject such an extra variable into a saved
    weights.tf and prove the converter ignores it: conversion succeeds and the
    converted parameters are identical to the clean-checkpoint conversion."""
    require_reference()
    import tensorflow as tf
    from MBExWN_NVoc.vocoder.model.models import create_model as ref_create_model

    from mbexwn_vocoder_tpu.compat.params_io import load_params
    from mbexwn_vocoder_tpu.compat.tf_checkpoint import convert_model_dir

    hp_ref = _small_hp()
    hp_ref["mbexwn_config"]["wavetable_config"]["trainable"] = False
    hp_ref["mbexwn_config"].pop("remat_wavenet_blocks", None)
    hp_ref["mbexwn_config"].pop("wn_compute_dtype", None)
    hp_ref["mbexwn_config"].pop("subnet_compute_dtype", None)

    tf.random.set_seed(2)
    ref_model, _ = ref_create_model(hp_ref, hp_ref["training_config"], hp_ref["preprocess_config"],
                                    quiet=True, use_tf25_compatible_implementation=True)
    ref_model.build_model(variable_time_dim=True)

    clean_dir = str(tmp_path / "clean")
    dirty_dir = str(tmp_path / "dirty")
    for d in (clean_dir, dirty_dir):
        os.makedirs(d)
        dump_config(os.path.join(d, "config.yaml"), hp_ref)
    ref_model.save_weights(os.path.join(clean_dir, "weights.tf"))

    # attach a legacy trial variable to the object graph, save, detach: the
    # dirty checkpoint now holds a variable no freshly-built model will own
    ref_model.legacy_trial_kernel = tf.Variable(
        np.random.RandomState(7).randn(3, 5).astype(np.float32), name="legacy_trial_kernel"
    )
    ref_model.save_weights(os.path.join(dirty_dir, "weights.tf"))
    del ref_model.legacy_trial_kernel

    out_clean = convert_model_dir(clean_dir)
    out_dirty = convert_model_dir(dirty_dir)
    a = jax.tree_util.tree_leaves_with_path(load_params(out_clean))
    b = jax.tree_util.tree_leaves_with_path(load_params(out_dirty))
    assert len(a) == len(b)
    for (pa, va), (pb, vb) in zip(sorted(a, key=lambda x: str(x[0])),
                                  sorted(b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
