"""API surface coverage: return_F0 PP payloads, hop-size mel adaptation,
folded-at-load inference params."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model


def _small():
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    return model, params


def test_infer_return_f0_payload():
    """infer(return_F0=True) returns [F0, PSig, PS] control signals
    (wavegen_1d.py:515-522, custom_pulsed_generator.py:756-767)."""
    model, params = _small()
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 8, 80).astype(np.float32) * 0.5 - 4)
    y, PP = model.infer(params, mel, synth_length=2400, return_F0=True)
    assert y.shape == (1, 2400)
    names = [p[0] for p in PP]
    assert names == ["F0", "PSig", "PS"]
    f0 = np.asarray(PP[0][1])
    assert f0.shape[1] <= 2400 and np.all(f0 >= 40.0) and np.all(f0 <= 600.0)


def test_scale_mel_hop_adaptation():
    """A .mell produced at a different hop rate is interpolated onto the
    model's frame grid (mel_inverter.py:117-146)."""
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    inv = MELInverter("SPEECH")
    T_src = 50
    dd = {
        "mell": np.random.RandomState(0).randn(80, T_src).astype(np.float32) - 8,
        "nfft": 2048,
        "hoplen": 240,  # 100 Hz frame rate instead of 80 Hz
        "winlen": 960,
        "nmels": 80,
        "sr": 24000,
        "fmin": 0.0,
        "fmax": 12000.0,
        "lin_spec_offset": 1e-5,
        "lin_spec_scale": 1.0,
        "log_spec_offset": 0.0,
        "log_spec_scale": 1.0,
        "time_axis": 1,
    }
    mell = inv.scale_mel(dd)
    # duration-preserving: 50 frames * 240 / 300 -> ~40 frames
    assert abs(mell.shape[1] - T_src * 240 / 300) <= 1
    assert np.all(np.isfinite(mell))


def test_folded_params_at_load(tmp_path):
    """MELInverter folds weight norm at load; outputs match the (v,g) form."""
    import os

    from mbexwn_vocoder_tpu.compat.params_io import save_params
    from mbexwn_vocoder_tpu.config import dump_config
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    # noise channel off: the draw depends on the padded length, so only the
    # deterministic path is comparable across MELInverter's length bucketing
    mc["pp_mod_subnet_noise_channel_sigma"] = 0.0
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(1), batch_size=1, T_mel=8)

    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    save_params(os.path.join(mdir, "weights.npz"), params)
    dump_config(os.path.join(mdir, "config.yaml"), hp)

    # exact-length bucket: isolates fold-vs-(v,g) equivalence from any
    # length-bucketing boundary effects
    inv = MELInverter(mdir, length_buckets=(8,))
    paths = [jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(inv.params)]
    assert not any("'v'" in p for p in paths)
    assert any("'kernel'" in p for p in paths)

    mel = np.random.RandomState(2).randn(1, 8, 80).astype(np.float32) * 0.5 - 4
    y_folded = inv.synth_from_mel(mel)
    y_vg = np.asarray(model.infer(params, jnp.asarray(mel), synth_length=2400)).ravel()
    np.testing.assert_allclose(y_folded, y_vg, rtol=1e-3, atol=2e-4)

    # bucket padding only perturbs the tail within the conv receptive field
    # (~30 mel frames); the leading region must match the exact computation
    inv2 = MELInverter(mdir, length_buckets=(64,))
    T = 40
    mel2 = np.random.RandomState(3).randn(1, T, 80).astype(np.float32) * 0.5 - 4
    y_pad = inv2.synth_from_mel(mel2)
    assert y_pad.shape == (T * 300,)
    y_exact = np.asarray(model.infer(params, jnp.asarray(mel2), synth_length=T * 300)).ravel()
    lead = (T - 32) * 300
    np.testing.assert_allclose(y_pad[:lead], y_exact[:lead], rtol=1e-3, atol=1e-3)


def test_mel_inverter_warm(tmp_path):
    """warm() precompiles selected buckets; subsequent synthesis reuses them."""
    import os

    from mbexwn_vocoder_tpu.compat.params_io import save_params
    from mbexwn_vocoder_tpu.config import dump_config, read_config
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    save_params(os.path.join(mdir, "weights.npz"), params)
    dump_config(os.path.join(mdir, "config.yaml"), hp)

    inv = MELInverter(mdir, length_buckets=(16, 32))
    inv.warm()
    assert set(inv._jitted.keys()) == {16, 32}
    y = inv.synth_from_mel(np.zeros((1, 10, 80), np.float32) - 8)
    assert y.shape == (10 * 300,)
