"""Pipelined batch-1 serving (serving.py): equality with the blocking path,
order preservation, bucket padding semantics, CLI flag wiring.

The pipeline only reorders *host blocking*, never computation: every
utterance runs through the same per-bucket jitted program as
MELInverter.synth_from_mel, so results must match that path exactly.
"""
import numpy as np
import pytest

import jax

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import read_config
from mbexwn_vocoder_tpu.models import create_model
from mbexwn_vocoder_tpu.serving import PipelinedSynthesizer


@pytest.fixture(scope="module")
def small_model():
    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["pp_mod_subnet_noise_channel_sigma"] = 0  # deterministic across calls
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    return model, params


def _mels(n, lengths, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(T, 80).astype(np.float32) * 0.5 - 4.0 for T in lengths[:n]]


def test_pipeline_matches_blocking_path(small_model):
    model, params = small_model
    hop = model.spect_hop_size
    mels = _mels(4, [8, 8, 8, 8])
    ps = PipelinedSynthesizer(model, params, length_buckets=(8, 16), depth=2, batch=1)
    got = ps.map(mels)
    fn = ps._fn(8)
    for m, y in zip(mels, got):
        ref = np.asarray(fn(params, m[None]))[0, : m.shape[0] * hop]
        assert y.shape == (m.shape[0] * hop,)
        np.testing.assert_array_equal(y, ref)


def test_pipeline_mixed_lengths_and_order(small_model):
    """Mixed bucket sizes arrive back in submission order with padded tails
    trimmed to each utterance's true length."""
    model, params = small_model
    hop = model.spect_hop_size
    lengths = [5, 12, 8, 3, 16]
    mels = _mels(5, lengths, seed=1)
    ps = PipelinedSynthesizer(model, params, length_buckets=(8, 16), depth=3, batch=1)
    got = ps.map(mels)
    assert [y.shape[0] for y in got] == [T * hop for T in lengths]
    # order: each result must equal its own utterance's blocking synthesis
    for m, y in zip(mels, got):
        T_pad = ps._bucket_len(m.shape[0])
        mel_in = np.concatenate([m[None], np.repeat(m[None, -1:], T_pad - m.shape[0], axis=1)], axis=1)
        ref = np.asarray(ps._fn(T_pad)(params, mel_in))[0, : m.shape[0] * hop]
        np.testing.assert_array_equal(y, ref)


def test_stream_is_incremental(small_model):
    """stream() yields result i after only ~depth dispatches, not after all
    inputs are consumed (the property that bounds serving latency)."""
    model, params = small_model
    consumed = []

    def feed():
        for i, m in enumerate(_mels(4, [8] * 4, seed=2)):
            consumed.append(i)
            yield m

    ps = PipelinedSynthesizer(model, params, length_buckets=(8,), depth=2, batch=1)
    it = ps.stream(feed())
    next(it)
    assert len(consumed) == 2  # depth in flight, not the whole input list
    assert len(list(it)) == 3


def test_micro_batching_matches_per_utterance(small_model):
    """batch>1: same-bucket utterances stack into one device batch; results
    come back in submission order, equal (within batched-conv fp
    reassociation) to the per-utterance blocking path, across bucket changes
    and a partial trailing group."""
    model, params = small_model
    hop = model.spect_hop_size
    lengths = [8, 7, 8, 12, 16, 5, 8]  # buckets: 8,8,8,16,16,8,8
    mels = _mels(7, lengths, seed=3)
    ps = PipelinedSynthesizer(model, params, length_buckets=(8, 16), depth=2, batch=3)
    got = ps.map(mels)
    assert [y.shape[0] for y in got] == [T * hop for T in lengths]
    ps1 = PipelinedSynthesizer(model, params, length_buckets=(8, 16), depth=1, batch=1)
    for m, y, y1 in zip(mels, got, ps1.map(mels)):
        scale = max(np.abs(y1).max(), 1e-6)
        np.testing.assert_allclose(y / scale, y1 / scale, rtol=0, atol=3e-5)

    with pytest.raises(ValueError):
        PipelinedSynthesizer(model, params, batch=0)


def test_default_coalescing(small_model):
    """Coalescing is the out-of-the-box behavior (VERDICT r3 #6): the default
    constructor micro-batches concurrent same-bucket requests, while a single
    request still dispatches as a batch-1 program (flush-at-end => one-item
    group => bit-identical to the blocking path)."""
    model, params = small_model
    hop = model.spect_hop_size
    ps = PipelinedSynthesizer(model, params, length_buckets=(8, 16))
    assert ps.batch > 1  # coalescing on by default
    assert ps.depth >= 2  # overlapped dispatch on by default

    # 1) a single request is untouched: same program as the blocking path
    (m,) = _mels(1, [8], seed=4)
    got = ps.map([m])
    ref = np.asarray(ps._fn(8)(params, m[None]))[0, : m.shape[0] * hop]
    np.testing.assert_array_equal(got[0], ref)

    # 2) 8 concurrent same-bucket requests coalesce into ONE dispatch group
    dispatched = []
    orig = ps._dispatch_group

    def spy(group, T_pad):
        dispatched.append(len(group))
        return orig(group, T_pad)

    ps._dispatch_group = spy
    mels = _mels(8, [8] * 8, seed=5)
    got = ps.map(mels)
    assert dispatched == [8]
    assert [y.shape[0] for y in got] == [8 * hop] * 8


def test_warm_precompiles_buckets(small_model):
    model, params = small_model
    ps = PipelinedSynthesizer(model, params, length_buckets=(8, 16), depth=2)
    ps.warm()
    assert set(ps._jitted) == {8, 16}


def test_depth_validation(small_model):
    model, params = small_model
    with pytest.raises(ValueError):
        PipelinedSynthesizer(model, params, depth=0)
    with pytest.raises(ValueError):
        PipelinedSynthesizer(model, params).map([np.zeros((2, 8, 80), np.float32)])
