"""Full-size oracle parity: the REAL flagship SPEECH config (320 channels,
two 12-layer WaveNet blocks, 6-band PQMF) built in both frameworks with
converted weights, compared stage by stage.

This is the benchmarked architecture itself, not a shrunk stand-in
(reference full-infer path: wavegen_1d.py:483-526).  The per-stage error
budget asserted here is documented in COMPONENTS.md ("full-size error
budget"); the small-config tests in test_model_parity.py cover the same
stages at higher iteration speed.

Opt-in (MBEXWN_RUN_SLOW=1): building the full TF reference model on CPU
takes several minutes.
"""
import copy
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MBEXWN_RUN_SLOW") != "1",
    reason="full-size oracle parity is opt-in: set MBEXWN_RUN_SLOW=1 (builds the full TF model, ~minutes)",
)

# per-stage relative-RMS error budget.  Measured on the full 320-ch model
# (2026-08-17): wavetables 0, F0 7.5e-9, excitation 4.6e-5, envelope 9.3e-8,
# full 2.4e-4 -- fp32 TF-vs-XLA reassociation only (same math, converted
# weights).  Budget = measured x ~4-10 headroom; table in COMPONENTS.md.
BUDGET = {
    "wavetables_atol": 1e-6,
    "F0_rel": 1e-6,
    "excitation_rel": 3e-4,
    "envelope_rel": 1e-5,
    "full_rel": 1e-3,
}


@pytest.fixture(scope="module")
def full_models():
    from .reference_oracle import require_reference

    require_reference()
    import tensorflow as tf
    from MBExWN_NVoc.vocoder.model.models import create_model as ref_create_model

    import jax

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.compat.tf_weight_map import pan_wavenet_params
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model

    tf.random.set_seed(0)
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    # the only deviations from the shipped config: disable the two
    # irreproducible-by-construction paths (uninjectable tf.random noise,
    # reference NormMel axis bug -- see test_model_parity._oracle_hparams)
    mc["pp_mod_subnet_noise_channel_sigma"] = 0.0
    mc["normalize_rms_from_mell"] = False

    hp_ref = copy.deepcopy(hp)
    hp_ref["mbexwn_config"]["wavetable_config"]["trainable"] = False
    hp_ref["mbexwn_config"].pop("remat_wavenet_blocks", None)
    hp_ref["mbexwn_config"].pop("wn_compute_dtype", None)
    hp_ref["mbexwn_config"].pop("subnet_compute_dtype", None)

    ref_model, _ = ref_create_model(hp_ref, hp_ref["training_config"], hp_ref["preprocess_config"],
                                    quiet=True, use_tf25_compatible_implementation=True)
    ref_model.build_model(variable_time_dim=True)

    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    import jax.numpy as jnp

    params = pan_wavenet_params(ref_model, model, jnp)
    return ref_model, model, params, hp


def _rel(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2) / (np.mean(b**2) + 1e-12)))


def test_full_size_stage_budget(full_models):
    import jax.numpy as jnp
    import tensorflow as tf

    ref_model, model, params, hp = full_models
    rng = np.random.RandomState(0)
    T_mel = 12
    hop = hp["preprocess_config"]["hop_size"]
    mel = (rng.randn(1, T_mel, 80) * 0.5 - 4.0).astype(np.float32)
    report = {}

    # stage 0: wavetable grids identical
    wt_ref = np.asarray(ref_model.block.pulse_generator.wavetables)
    wt = np.asarray(model.block.wavetable.wavetables)
    report["wavetables_max_abs"] = float(np.abs(wt - wt_ref).max())
    assert report["wavetables_max_abs"] < BUDGET["wavetables_atol"]

    # stage 1: F0 predictor (320-ch conditioning stack upstream)
    f0_ref = ref_model.block.generate_f0(mel).numpy()
    f0 = np.asarray(model.block.generate_f0(params, jnp.asarray(mel)))
    report["F0_rel"] = _rel(f0, f0_ref)
    assert report["F0_rel"] < BUDGET["F0_rel"], report

    # stage 2: excitation (oscillator -> 2x12-layer WaveNet -> 6-band PQMF)
    f0_fixed = (140 + 40 * np.sin(np.linspace(0, 6, T_mel * 150))).astype(np.float32)[None]
    exc_ref = ref_model.block.generate_excitation(mel, f0_fixed).numpy()
    exc = np.asarray(model.block.generate_excitation(params, jnp.asarray(mel), jnp.asarray(f0_fixed)))
    report["excitation_rel"] = _rel(exc, exc_ref)
    assert report["excitation_rel"] < BUDGET["excitation_rel"], report

    # stage 3: cepstral spectral envelope
    env_ref = ref_model.block.generate_specenv(mel, tf.constant(f0_fixed)).numpy()
    env = np.asarray(model.block.generate_specenv(params, jnp.asarray(mel), jnp.asarray(f0_fixed)))
    report["envelope_rel"] = _rel(np.abs(env), np.abs(env_ref))
    assert report["envelope_rel"] < BUDGET["envelope_rel"], report

    # stage 4: full infer (the benchmarked program end to end)
    y_ref = ref_model.infer(mel, synth_length=T_mel * hop).numpy()
    y = np.asarray(model.infer(params, jnp.asarray(mel), synth_length=T_mel * hop))
    assert y.shape == y_ref.shape
    report["full_rel"] = _rel(y, y_ref)
    assert report["full_rel"] < BUDGET["full_rel"], report

    print("\nfull-size per-stage parity report:", {k: f"{v:.3g}" for k, v in report.items()})
