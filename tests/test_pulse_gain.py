"""Pulse-synchronous gain (reference tf_wavetable.py:561-600, 642-712).

The reference realizes both modes with boolean_mask + gather over flattened
batches; the TPU build uses associative hold scans.  These tests check the
scan formulation against a direct numpy transliteration of the reference's
index arithmetic.
"""
import numpy as np
import jax.numpy as jnp

from mbexwn_vocoder_tpu.ops.oscillator import (
    hold_last,
    pulse_start_mask,
    pulse_sync_gain_avg,
    pulse_sync_gain_hold,
    stable_cumsum_and_wrap,
)


def _phase(B=3, T=400, seed=0):
    rng = np.random.RandomState(seed)
    f0 = 80.0 + 200.0 * rng.rand(B, T).astype(np.float32)
    return np.asarray(stable_cumsum_and_wrap(jnp.asarray(f0) / 12000.0))


def _ref_hold(phase, gain):
    """tf_wavetable.py:583-591: sample gain at pulse starts, index by
    cumsum(mask)-1 over the flattened batch."""
    B, T = phase.shape
    mask = np.concatenate([np.ones((B, 1), bool), phase[:, 1:] < phase[:, :-1]], axis=1)
    at_bounds = gain[mask]  # flattened over batch, row-major
    inds = np.cumsum(mask.reshape(-1).astype(np.int64)) - 1
    return at_bounds[inds].reshape(B, T)


def _ref_avg(phase, gain):
    """tf_wavetable.py:684-711: flattened segment sums via boolean_mask."""
    B, T = phase.shape
    flat = B * T
    bounds = np.concatenate([phase[:, :-1] > phase[:, 1:], np.ones((B, 1), bool)], axis=1).reshape(flat)
    gain_inds = np.concatenate([[0], np.cumsum(bounds[:-1].astype(np.int64))])
    nl = np.arange(flat)
    last_pos = nl[bounds]
    lengths = np.concatenate([last_pos[:1] + 1, last_pos[1:] - last_pos[:-1]])
    c = np.cumsum(gain.reshape(flat))
    c_sums = c[bounds]
    seg = np.concatenate([c[last_pos[0] : last_pos[0] + 1], c_sums[1:] - c_sums[:-1]]) / lengths
    return seg[gain_inds].reshape(B, T)


def test_hold_last_basic():
    v = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
    m = jnp.asarray([[True, False, True, False, False]])
    np.testing.assert_array_equal(np.asarray(hold_last(v, m)), [[1, 1, 3, 3, 3]])


def test_pulse_start_mask_marks_wraps():
    phase = _phase()
    mask = np.asarray(pulse_start_mask(jnp.asarray(phase)))
    assert mask[:, 0].all()
    # at least one wrap per row given 80+ Hz over 400 samples at 12 kHz
    assert (mask[:, 1:].sum(axis=1) >= 1).all()


def test_hold_mode_matches_reference_arithmetic():
    phase = _phase()
    gain = np.random.RandomState(1).rand(*phase.shape).astype(np.float32)
    ours = np.asarray(pulse_sync_gain_hold(jnp.asarray(phase), jnp.asarray(gain)))
    np.testing.assert_allclose(ours, _ref_hold(phase, gain), rtol=0, atol=0)


def test_avg_mode_matches_reference_arithmetic():
    phase = _phase(seed=2)
    gain = np.random.RandomState(3).rand(*phase.shape).astype(np.float32)
    ours = np.asarray(pulse_sync_gain_avg(jnp.asarray(phase), jnp.asarray(gain)))
    np.testing.assert_allclose(ours, _ref_avg(phase, gain), rtol=2e-5, atol=2e-5)


def test_avg_mode_piecewise_constant_per_pulse():
    phase = _phase(B=1, T=600, seed=4)
    gain = np.random.RandomState(5).rand(1, 600).astype(np.float32)
    out = np.asarray(pulse_sync_gain_avg(jnp.asarray(phase), jnp.asarray(gain)))
    mask = np.asarray(pulse_start_mask(jnp.asarray(phase)))[0]
    seg_id = np.cumsum(mask) - 1
    for sid in range(seg_id.max() + 1):
        seg = out[0, seg_id == sid]
        assert np.allclose(seg, seg[0], atol=1e-6)


def test_model_level_api():
    """MBExWN.oscillate_with_pulse_gains mirrors the reference call surface."""
    import jax

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model

    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    blk = model.block

    T12k = 8 * blk.spect_to_pulse_upsampling_factor
    f0 = jnp.full((1, T12k), 150.0, dtype=jnp.float32)
    g = jnp.asarray(np.random.RandomState(0).rand(1, T12k).astype(np.float32))

    outs = blk.oscillate_with_pulse_gains(params, f0, [g, None])
    assert len(outs) == 2 and outs[1] is None
    assert outs[0].shape == (1, T12k)

    audios, gains = blk.oscillate_with_pulse_gains(
        params, f0, [g], pulse_sync_gain_avg=True, return_gain=True
    )
    assert audios[0].shape == gains[0].shape == (1, T12k)
    # per-pulse constant: gains change only at phase wraps
    gnp = np.asarray(gains[0])[0]
    changes = np.sum(np.abs(np.diff(gnp)) > 1e-7)
    wraps = np.asarray(
        pulse_start_mask(stable_cumsum_and_wrap(f0 / blk.wavetable.sample_rate))
    )[0, 1:].sum()
    assert changes <= wraps
