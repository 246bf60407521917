"""Training subsystem tests: loss parity vs the reference, trainer smoke,
and DP-equals-single-device."""
import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.training import SpectLossComponents, Trainer
from mbexwn_vocoder_tpu.training.losses import f0_pred_loss_mask, f0_rec_loss_mask

from .reference_oracle import require_reference


def _small_hparams():
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"]["n_channels"] = 16
    mc["pp_mod_subnet"]["n_layers"] = 2
    mc["pp_mod_subnet"]["n_out_channels"] = 8
    mc["normalize_rms_from_mell"] = False
    mc["pp_F0_loss_weight"] = 1.0
    mc["pp_teacher_forcing_schedule"] = {"initial": 0.5}
    mc["stft_coh_loss_weight"] = 0.1
    return hp


def test_spect_loss_parity_with_reference():
    require_reference()
    from MBExWN_NVoc.vocoder.model.wavegen_1d import SpectLossComponents as RefSLC

    hp = _small_hparams()
    tc, pc = hp["training_config"], hp["preprocess_config"]

    ref = RefSLC(tc, pc, quiet=True)
    # the shipped reference never sets these two attributes (set only in the
    # unshipped trainer); provide them so the oracle path runs
    ref.NPOW_loss_weight = tc["spect_loss_config"]["NPOW_loss_weight"]
    ref.log_db_fac = 20 * np.log10(2) / np.log(2)

    ours = SpectLossComponents(tc, pc)

    rng = np.random.RandomState(0)
    a = rng.randn(2, 4800).astype(np.float32) * 0.1
    b = (a + 0.05 * rng.randn(2, 4800)).astype(np.float32)

    mel_ref, spect_ref, npow_ref = ref.calc_losses(a[:, :, None], b[:, :, None])
    ours_losses = ours.calc_losses(jnp.asarray(a), jnp.asarray(b))

    np.testing.assert_allclose(float(ours_losses["spect_loss"]), float(spect_ref), rtol=2e-4)
    np.testing.assert_allclose(float(ours_losses["NPOW_loss"]), float(npow_ref), rtol=2e-4)
    np.testing.assert_allclose(float(ours_losses["mel_loss"]), float(mel_ref), rtol=2e-4)


def test_spect_loss_variants_dimension_parity():
    """train_with_avg=1 with a (B, V, T) variants dimension: both
    implementations strip to variant 0 (wavegen_1d.py:187-190, the
    reference's only live branch -- >1 dies upstream on an undefined
    syn_spec_list at :200); the spectral errors must agree, and must equal
    the plain 2-D call on variant 0."""
    require_reference()
    from MBExWN_NVoc.vocoder.model.wavegen_1d import SpectLossComponents as RefSLC

    hp = _small_hparams()
    tc, pc = hp["training_config"], hp["preprocess_config"]

    ref = RefSLC(tc, pc, quiet=True, train_with_avg=1)
    ref.NPOW_loss_weight = tc["spect_loss_config"]["NPOW_loss_weight"]
    ours = SpectLossComponents(tc, pc, train_with_avg=1, sub_sample_facts=[1, 2])

    rng = np.random.RandomState(3)
    a = rng.randn(2, 4800).astype(np.float32) * 0.1
    b = (a[:, None] + 0.05 * rng.randn(2, 3, 4800)).astype(np.float32)  # 3 variants

    spect_ref, npow_ref = ref.calc_spectral_error(a, b)
    spect_ours, npow_ours = ours.calc_spectral_error(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(spect_ours), float(spect_ref), rtol=2e-4)
    np.testing.assert_allclose(float(npow_ours), float(npow_ref), rtol=2e-4)

    s0, n0 = ours.calc_spectral_error(jnp.asarray(a), jnp.asarray(b[:, 0]))
    np.testing.assert_allclose(float(spect_ours), float(s0), rtol=1e-6)

    # train_with_avg>1 (our working extension of the dead upstream path):
    # averages the scaled variant spectra; identical variants == variant 0
    ours_avg = SpectLossComponents(tc, pc, train_with_avg=3)
    b_same = np.repeat(b[:, :1], 3, axis=1)
    s_avg, n_avg = ours_avg.calc_spectral_error(jnp.asarray(a), jnp.asarray(b_same))
    np.testing.assert_allclose(float(s_avg), float(s0), rtol=1e-5)
    np.testing.assert_allclose(float(n_avg), float(n0), rtol=1e-5)
    # distinct variants engage the average (different from any single variant)
    s_mix, _ = ours_avg.calc_spectral_error(jnp.asarray(a), jnp.asarray(b))
    assert abs(float(s_mix) - float(s0)) > 1e-6


def test_f0_masks():
    """Mask semantics: unvoiced/voiced segments dilated by the limit length."""
    f0 = np.zeros((1, 40), np.float32)
    f0[0, 10:30] = 100.0
    limit = 3
    pred = np.asarray(f0_pred_loss_mask(jnp.asarray(f0), limit))
    rec = np.asarray(f0_rec_loss_mask(jnp.asarray(f0), limit))
    # pred mask: voiced eroded by `limit` on both sides
    expected_pred = np.zeros((1, 40), np.float32)
    expected_pred[0, 10 + limit : 30 - limit] = 1.0
    np.testing.assert_array_equal(pred, expected_pred)
    # rec mask: voiced dilated by `limit` on both sides
    expected_rec = np.zeros((1, 40), np.float32)
    expected_rec[0, 10 - limit : 30 + limit] = 1.0
    np.testing.assert_array_equal(rec, expected_rec)


@pytest.fixture(scope="module")
def trainer_setup():
    hp = _small_hparams()
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    trainer = Trainer(model, hp)
    state = trainer.init_state(jax.random.PRNGKey(0), T_mel=8, batch_size=2)
    rng = np.random.RandomState(1)
    T_mel, hop = 8, hp["preprocess_config"]["hop_size"]
    batch = {
        "audio": jnp.asarray(rng.randn(2, T_mel * hop).astype(np.float32) * 0.1),
        "mel": jnp.asarray((rng.randn(2, T_mel, 80) * 0.5 - 4).astype(np.float32)),
        "F0": jnp.asarray(np.tile((120 + 10 * rng.randn(2, T_mel * hop)).astype(np.float32), (1, 1))),
    }
    return trainer, state, batch


def test_train_step_runs_and_updates(trainer_setup):
    trainer, state, batch = trainer_setup
    new_state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "spect_loss" in metrics and "F0_loss" in metrics and "stft_coh_loss" in metrics
    assert int(new_state.step) == 1
    # params actually moved
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.abs(np.asarray(leaf0) - np.asarray(leaf1)).max() > 0


def test_grads_finite(trainer_setup):
    trainer, state, batch = trainer_setup
    (loss, metrics), grads = jax.value_and_grad(trainer.loss_fn, has_aux=True)(
        state.params, batch, jnp.int32(0), jax.random.PRNGKey(3)
    )
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_bf16_train_step_grads(monkeypatch):
    """Training works in the shipped bf16 compute modes: the custom VJP in
    ops/conv.py keeps the fp32-accumulated forward differentiable (the stock
    transpose rule rejects the fp32-cotangent x bf16-kernel transpose conv).
    Grads must exist, be finite, and track the fp32 grads."""
    monkeypatch.setenv("MBEXWN_WN_DTYPE", "bfloat16")
    monkeypatch.setenv("MBEXWN_SUBNET_DTYPE", "bfloat16")
    hp = _small_hparams()
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    trainer = Trainer(model, hp)
    state = trainer.init_state(jax.random.PRNGKey(0), T_mel=8, batch_size=2)
    rng = np.random.RandomState(1)
    T_mel, hop = 8, hp["preprocess_config"]["hop_size"]
    batch = {
        "audio": jnp.asarray(rng.randn(2, T_mel * hop).astype(np.float32) * 0.1),
        "mel": jnp.asarray((rng.randn(2, T_mel, 80) * 0.5 - 4).astype(np.float32)),
        "F0": jnp.asarray((120 + 10 * rng.randn(2, T_mel * hop)).astype(np.float32)),
    }
    (loss, _), grads = jax.value_and_grad(trainer.loss_fn, has_aux=True)(
        state.params, batch, jnp.int32(0), jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    # fp32 reference grads on the same model/batch: bf16 grads must correlate
    monkeypatch.setenv("MBEXWN_WN_DTYPE", "")
    monkeypatch.setenv("MBEXWN_SUBNET_DTYPE", "")
    model32, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    trainer32 = Trainer(model32, hp)
    (_, _), grads32 = jax.value_and_grad(trainer32.loss_fn, has_aux=True)(
        state.params, batch, jnp.int32(0), jax.random.PRNGKey(3)
    )
    g16 = np.concatenate([np.asarray(l).ravel() for l in leaves])
    g32 = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(grads32)])
    denom = np.linalg.norm(g16) * np.linalg.norm(g32) + 1e-12
    cos = float(np.dot(g16, g32) / denom)
    assert cos > 0.98, f"bf16/fp32 gradient cosine {cos}"


def test_pre_strided_f0_loss_identical(trainer_setup):
    """Compact-upload contract (cli/train.py::_prep): shipping F0 pre-strided
    to the pulse rate as batch key `F0_ds` is bit-identical to shipping the
    sample-rate contour and striding on device (trainer.training_forward)."""
    trainer, state, batch = trainer_setup
    rng = jax.random.PRNGKey(7)
    loss_full, aux_full = trainer.loss_fn(state.params, batch, jnp.int32(0), rng)
    compact = {
        "audio": batch["audio"],
        "mel": batch["mel"],
        "F0_ds": batch["F0"][:, :: trainer.F0_down],
    }
    loss_ds, aux_ds = trainer.loss_fn(state.params, compact, jnp.int32(0), rng)
    assert float(loss_full) == float(loss_ds)
    for k in aux_full:
        if aux_full[k] is not None:
            np.testing.assert_array_equal(np.asarray(aux_full[k]), np.asarray(aux_ds[k]))


def test_fp16_upload_dequant_close(trainer_setup):
    """fp16-upload batches (audio/mel dequantized to fp32 in loss_fn) keep the
    loss within the fp16 quantization floor of the fp32-upload loss."""
    trainer, state, batch = trainer_setup
    rng = jax.random.PRNGKey(8)
    loss32, _ = trainer.loss_fn(state.params, batch, jnp.int32(0), rng)
    half = {
        "audio": jnp.asarray(np.asarray(batch["audio"], dtype=np.float16)),
        "mel": jnp.asarray(np.asarray(batch["mel"], dtype=np.float16)),
        "F0_ds": batch["F0"][:, :: trainer.F0_down],
    }
    loss16, _ = trainer.loss_fn(state.params, half, jnp.int32(0), rng)
    assert np.isfinite(float(loss16))
    assert abs(float(loss16) - float(loss32)) / max(abs(float(loss32)), 1e-6) < 5e-3


def test_dp_matches_single_device(trainer_setup):
    """DP over an 8-device CPU mesh gives the same loss/params as one device."""
    from jax.sharding import Mesh

    trainer, state, batch = trainer_setup
    hp = trainer.hparams

    # batch of 8 so each device gets one sample
    rng = np.random.RandomState(4)
    T_mel, hop = 8, hp["preprocess_config"]["hop_size"]
    big_batch = {
        "audio": jnp.asarray(rng.randn(8, T_mel * hop).astype(np.float32) * 0.1),
        "mel": jnp.asarray((rng.randn(8, T_mel, 80) * 0.5 - 4).astype(np.float32)),
        "F0": jnp.asarray((120 + 10 * rng.randn(8, T_mel * hop)).astype(np.float32)),
    }

    devs = jax.devices()
    assert len(devs) >= 8, "tests must run with xla_force_host_platform_device_count=8"
    mesh = Mesh(np.array(devs[:8]), ("data",))

    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    tr_dp = Trainer(model, hp, mesh=mesh)
    tr_single = Trainer(model, hp, mesh=None)

    state0 = tr_single.init_state(jax.random.PRNGKey(0), T_mel=8, batch_size=8)
    state0b = tr_single.init_state(jax.random.PRNGKey(0), T_mel=8, batch_size=8)

    with mesh:
        s_dp, m_dp = tr_dp.jitted_train_step()(state0, big_batch, jax.random.PRNGKey(5))
    s_1, m_1 = tr_single.jitted_train_step()(state0b, big_batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m_dp["total_loss"]), float(m_1["total_loss"]), rtol=2e-5)
    l_dp = jax.tree_util.tree_leaves(s_dp.params)[0]
    l_1 = jax.tree_util.tree_leaves(s_1.params)[0]
    np.testing.assert_allclose(np.asarray(l_dp), np.asarray(l_1), rtol=1e-4, atol=1e-6)


def test_remat_wavenet_blocks_gradient_equivalence():
    """mbexwn_config remat_wavenet_blocks=True: jax.checkpoint around each
    WaveNet block changes memory, not math -- loss and grads match the
    non-remat model."""
    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.training import Trainer

    def build(remat):
        hp = read_config(mv.get_config_file("SPEECH"))
        mc = hp["mbexwn_config"]
        mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
        mc["normalize_rms_from_mell"] = False
        mc["remat_wavenet_blocks"] = remat
        model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
        return model, hp

    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, 2400).astype(np.float32) * 0.1),
        "mel": jnp.asarray((rng.randn(2, 8, 80) * 0.5 - 4).astype(np.float32)),
        "F0": jnp.asarray((120 + 10 * rng.randn(2, 2400)).astype(np.float32)),
    }
    results = []
    for remat in (False, True):
        model, hp = build(remat)
        trainer = Trainer(model, hp)
        state = trainer.init_state(jax.random.PRNGKey(0), T_mel=8, batch_size=2)
        new_state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        results.append((float(metrics["total_loss"]), new_state.params))

    (l0, p0), (l1, p1) = results
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for (k0, a), (k1, b) in zip(
        jax.tree_util.tree_leaves_with_path(p0), jax.tree_util.tree_leaves_with_path(p1)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(k0))
