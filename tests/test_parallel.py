"""Parallelism tests on the virtual 8-device CPU mesh: DP batch synthesis and
chunked streaming vs one-shot equality (SURVEY §4 property tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.parallel import BatchSynthesizer, StreamingSynthesizer, make_mesh


def _small_model(noise_sigma=0.0):
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"]["n_channels"] = 16
    mc["pp_mod_subnet"]["n_layers"] = 3
    mc["pp_mod_subnet"]["n_out_channels"] = 8
    mc["pp_mod_subnet_noise_channel_sigma"] = noise_sigma
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    return model, params


@pytest.fixture(scope="module")
def model_params():
    return _small_model()


def test_batch_synthesizer_dp(model_params):
    model, params = model_params
    mesh = make_mesh(n_data=8)
    rng = np.random.RandomState(0)
    mells = [
        (rng.randn(T, 80) * 0.5 - 4).astype(np.float32)
        for T in (20, 35, 35, 50, 20, 28, 35, 50, 20, 31)
    ]
    bs_dp = BatchSynthesizer(model, params, mesh=mesh, length_buckets=(32, 64))
    bs_1 = BatchSynthesizer(model, params, mesh=None, length_buckets=(32, 64))
    with mesh:
        out_dp = bs_dp.synth_batch(mells)
    out_1 = bs_1.synth_batch(mells)
    assert len(out_dp) == len(mells)
    for y_dp, y_1, m in zip(out_dp, out_1, mells):
        assert y_dp.shape == (m.shape[0] * 300,)
        np.testing.assert_allclose(y_dp, y_1, rtol=1e-3, atol=1e-4)


def test_streaming_matches_one_shot(model_params):
    """Chunked synthesis with phase carry == one-shot, up to fp32 cumsum noise."""
    model, params = model_params
    rng = np.random.RandomState(1)
    T = 96  # 1.2 s
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)

    y_one = np.asarray(model.infer(params, jnp.asarray(mell), synth_length=T * 300))
    ss = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=16)
    y_chunk = ss.synth(mell)
    assert y_chunk.shape == y_one.shape
    rel = np.sqrt(np.mean((y_chunk - y_one) ** 2) / (np.mean(y_one**2) + 1e-12))
    assert rel < 2e-3, rel


def test_streaming_long_form(model_params):
    """Long-form (~8 s here; the 60 s production case is the same program
    repeated) runs in constant memory per chunk and stays finite/continuous."""
    model, params = model_params
    rng = np.random.RandomState(2)
    T = 640
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    ss = StreamingSynthesizer(model, params, chunk_frames=128, halo_frames=24)
    y = ss.synth(mell)
    assert y.shape == (1, T * 300)
    assert np.all(np.isfinite(y))
    # only 2-3 distinct chunk shapes were compiled
    assert len(ss._jitted) <= 3


def test_phase_offset_continuity(model_params):
    """The phase_offset plumbing: synthesizing [0,T) equals synthesizing
    [0,T/2) + [T/2,T) with the carried phase, for the pure oscillator."""
    model, params = model_params
    blk = model.block
    rng = np.random.RandomState(3)
    f0 = (150 + 30 * np.abs(np.sin(np.linspace(0, 5, 6000)))).astype(np.float32)[None]

    full = np.asarray(blk._oscillate(params, jnp.asarray(f0)))
    h = 3000
    a = np.asarray(blk._oscillate(params, jnp.asarray(f0[:, :h])))
    carry = np.mod(np.sum(f0[:, :h].astype(np.float64), axis=1) / blk.pulse_rate, 1.0)
    b = np.asarray(
        blk._oscillate(params, jnp.asarray(f0[:, h:]), phase_offset=jnp.asarray(carry, dtype=jnp.float32))
    )
    stitched = np.concatenate([a, b], axis=1)
    np.testing.assert_allclose(stitched, full, rtol=1e-3, atol=5e-3)


def test_synth_batched_matches_one_shot(model_params):
    """Sequence-parallel batched chunk synthesis == one-shot (up to fp32
    cumsum noise), and groups chunk shapes into at most 3 programs."""
    model, params = model_params
    rng = np.random.RandomState(7)
    T = 96
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    y_one = np.asarray(model.infer(params, jnp.asarray(mell), synth_length=T * 300))

    ss = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=16)
    y_b = ss.synth_batched(mell)
    assert y_b.shape == y_one.shape
    rel = np.sqrt(np.mean((y_b - y_one) ** 2) / (np.mean(y_one**2) + 1e-12))
    assert rel < 2e-3, rel

    # and matches the sequential streaming path
    y_s = ss.synth(mell)
    rel2 = np.sqrt(np.mean((y_b - y_s) ** 2) / (np.mean(y_s**2) + 1e-12))
    assert rel2 < 2e-3, rel2


def test_synth_scan_matches_one_shot(model_params):
    """On-device lax.scan chunk loop (phase in the scan carry) == one-shot in
    the interior; edge chunks see edge-replicated halo context instead of the
    signal boundary, so only the first/last halo span may differ."""
    model, params = model_params
    rng = np.random.RandomState(9)
    T = 96
    hop = 300
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    y_one = np.asarray(model.infer(params, jnp.asarray(mell), synth_length=T * hop))

    h = 16
    ss = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=h)
    y_scan = ss.synth_scan(mell)
    assert y_scan.shape == y_one.shape
    lo, hi = h * hop, (T - h) * hop
    rel = np.sqrt(
        np.mean((y_scan[:, lo:hi] - y_one[:, lo:hi]) ** 2) / (np.mean(y_one[:, lo:hi] ** 2) + 1e-12)
    )
    assert rel < 2e-3, rel
    assert np.all(np.isfinite(y_scan))
    # a single compiled program runs the whole loop
    assert sum(1 for k in ss._jitted if k[0] == "scan") == 1


def test_synth_scan_pallas_stack(model_params):
    """The fused Pallas WaveNet stack inside the synth_scan body (interpret
    mode on CPU; on TPU the b1 auto-routing selects this same path inside the
    scan, which is how single-stream long-form runs) == the conv path."""
    model, params = model_params
    rng = np.random.RandomState(11)
    T = 96
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)

    ss = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=16)
    y_conv = ss.synth_scan(mell)

    import os

    os.environ["MBEXWN_PALLAS_WN"] = "1"
    try:
        ss_p = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=16)
        y_pal = ss_p.synth_scan(mell)
    finally:
        os.environ.pop("MBEXWN_PALLAS_WN", None)
    assert y_pal.shape == y_conv.shape
    rel = np.sqrt(np.mean((y_pal - y_conv) ** 2) / (np.mean(y_conv**2) + 1e-12))
    assert rel < 2e-3, rel


def test_synth_batched_multi_utterance(model_params):
    """synth_batched with B>1 equals the same utterances run individually."""
    model, params = model_params
    rng = np.random.RandomState(11)
    T = 96
    mell = (rng.randn(3, T, 80) * 0.5 - 4).astype(np.float32)
    ss = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=16)
    y_all = ss.synth_batched(mell)
    assert y_all.shape == (3, T * 300)
    for b in range(3):
        y_b = ss.synth_batched(mell[b : b + 1])
        # different batch compositions reassociate fp32 convs
        np.testing.assert_allclose(y_all[b : b + 1], y_b, rtol=1e-3, atol=1e-3)


def test_synth_scan_multi_utterance(model_params):
    """synth_scan is batched: B>1 equals per-utterance runs."""
    model, params = model_params
    rng = np.random.RandomState(12)
    T = 80
    mell = (rng.randn(2, T, 80) * 0.5 - 4).astype(np.float32)
    ss = StreamingSynthesizer(model, params, chunk_frames=32, halo_frames=16)
    y_all = ss.synth_scan(mell)
    assert y_all.shape == (2, T * 300)
    for b in range(2):
        y_b = ss.synth_scan(mell[b : b + 1])
        np.testing.assert_allclose(y_all[b : b + 1], y_b, rtol=1e-4, atol=2e-4)


@pytest.fixture(scope="module")
def causal_model_params():
    import mbexwn_vocoder_tpu as mv_
    from mbexwn_vocoder_tpu.config import read_config as rc

    hp = rc(mv_.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=3, n_out_channels=8)
    mc["pp_mod_subnet_noise_channel_sigma"] = 0.0
    mc["normalize_rms_from_mell"] = False
    mc["force_causal"] = True
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    return model, params


def test_causal_low_latency_chunked(causal_model_params):
    """force_causal + halo_right=2: a causal model needs only TWO mel frames
    of lookahead (conditioning interpolation + STFT OLA span) for chunked
    synthesis to match one-shot -- the low-latency mode the flag exists for
    (custom_pulsed_generator.py:215-218).  Algorithmic latency is therefore
    (chunk_frames+2)*hop samples, 25 ms of lookahead at the 24 kHz production
    rate, independent of utterance length."""
    model, params = causal_model_params
    rng = np.random.RandomState(13)
    T = 96
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    y_one = np.asarray(model.infer(params, jnp.asarray(mell), synth_length=T * 300))

    ss = StreamingSynthesizer(model, params, chunk_frames=16, halo_frames=16, halo_right=2)
    y = ss.synth(mell)
    assert y.shape == y_one.shape
    rel = np.sqrt(np.mean((y - y_one) ** 2) / (np.mean(y_one**2) + 1e-12))
    assert rel < 1e-3, rel

    # one frame of lookahead is NOT enough (the OLA window spans 2 frames):
    # guards against the tolerance silently hiding a broken halo plumbing
    ss1 = StreamingSynthesizer(model, params, chunk_frames=16, halo_frames=16, halo_right=1)
    rel1 = np.sqrt(np.mean((ss1.synth(mell) - y_one) ** 2) / (np.mean(y_one**2) + 1e-12))
    assert rel1 > 1e-3, rel1


def test_stream_incremental_api(causal_model_params):
    """stream(): frames pushed incrementally (any slab size) yield the same
    audio as one-shot synthesis, with only steady-state + boundary programs
    compiled."""
    model, params = causal_model_params
    rng = np.random.RandomState(14)
    T = 96
    mell = (rng.randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    y_one = np.asarray(model.infer(params, jnp.asarray(mell), synth_length=T * 300))

    ss = StreamingSynthesizer(model, params, chunk_frames=16, halo_frames=16, halo_right=2)
    outs = {}
    for slab in (1, 4, 7):
        chunks = list(ss.stream(mell[:, i : i + slab] for i in range(0, T, slab)))
        y = np.concatenate(chunks, axis=1)
        assert y.shape == y_one.shape
        outs[slab] = y
        rel = np.sqrt(np.mean((y - y_one) ** 2) / (np.mean(y_one**2) + 1e-12))
        assert rel < 1e-3, (slab, rel)
    # slab size must not change the result at all
    np.testing.assert_array_equal(outs[1], outs[4])
    np.testing.assert_array_equal(outs[1], outs[7])
    # matches the offline chunked path exactly (same chunk programs)
    np.testing.assert_array_equal(outs[1], ss.synth(mell))
    assert len(ss._jitted) <= 3


def test_stream_warm_precompiles_all_ramp_shapes(causal_model_params):
    """warm() compiles every chunk shape stream() hits, so streaming a real
    signal afterwards adds no new programs (no compile at first audio)."""
    model, params = causal_model_params
    ss = StreamingSynthesizer(model, params, chunk_frames=16, halo_frames=32, halo_right=2)
    ss.warm()
    n_programs = len(ss._jitted)
    T = 96
    mell = (np.random.RandomState(15).randn(1, T, 80) * 0.5 - 4).astype(np.float32)
    list(ss.stream(mell[:, i : i + 4] for i in range(0, T, 4)))
    # tail flush may truncate the lookahead at the signal end (T a multiple of
    # chunk_frames here, so the final chunk has hr=2 frames missing -> one
    # extra shape at most)
    assert len(ss._jitted) <= n_programs + 1, (n_programs, len(ss._jitted))


def test_tensor_parallel_wavenet(monkeypatch):
    """MBEXWN_TP_AXIS=model: WaveNet channel dim sharded over the 'model'
    mesh axis via GSPMD constraints -- output matches the unsharded model."""
    import os

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.parallel.mesh import make_mesh

    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    mc["pp_mod_subnet_noise_channel_sigma"] = 0.0
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=2, T_mel=8)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 8, 80).astype(np.float32) * 0.5 - 4)
    y_ref = np.asarray(model.infer(params, mel, synth_length=2400))

    monkeypatch.setenv("MBEXWN_TP_AXIS", "model")
    model_tp, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        y_tp = np.asarray(jax.jit(
            lambda p, m: model_tp.infer(p, m, synth_length=2400)
        )(params, mel))
    np.testing.assert_allclose(y_tp, y_ref, rtol=1e-3, atol=2e-4)
