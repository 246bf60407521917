"""End-to-end training pipeline: data loader (wav -> mel/F0), train CLI with
orbax checkpointing, resume, and inference-weight export."""
import json
import os

import numpy as np
import pytest

import jax


def _make_dataset(tmp_path, n_files=2, seconds=1.2):
    from mbexwn_vocoder_tpu.compat.audio_io import write_wav

    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_files):
        T = int(24000 * seconds)
        t = np.arange(T) / 24000.0
        f0 = 120 + 40 * np.sin(2 * np.pi * 0.7 * t + i)
        phase = np.cumsum(f0) / 24000.0
        x = 0.4 * np.sin(2 * np.pi * phase) + 0.02 * rng.randn(T)
        # an unvoiced gap
        x[T // 3 : T // 3 + 2400] = 0.05 * rng.randn(2400)
        write_wav(str(d / f"utt{i}.wav"), x.astype(np.float32), 24000)
    return str(d)


def test_f0_estimator_on_known_tone():
    from mbexwn_vocoder_tpu.dsp.f0 import estimate_f0, upsample_f0

    sr, hop = 24000, 300
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    f0 = estimate_f0(x, sr, hop)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert voiced.size > 0.9 * mid.size
    assert abs(np.median(voiced) - 220.0) < 3.0

    up = upsample_f0(f0, hop, x.size)
    assert up.shape == (x.size,)

    # silence is unvoiced
    f0s = estimate_f0(np.zeros(12000), sr, hop)
    assert np.all(f0s == 0)


def _estimate_f0_scalar(x, sample_rate, hop, fmin=50.0, fmax=600.0, frame_len=None, threshold=0.15):
    """Straight per-frame transcription of the YIN recipe (the original
    implementation of dsp/f0.py::estimate_f0) — oracle for the vectorized path."""
    x = np.asarray(x, dtype=np.float64)
    tau_min = max(2, int(sample_rate / fmax))
    tau_max = int(sample_rate / fmin)
    if frame_len is None:
        frame_len = 2 * tau_max
    n_frames = x.shape[-1] // hop + 1
    xp = np.pad(x, (frame_len // 2, frame_len + tau_max))
    f0 = np.zeros(n_frames)
    for i in range(n_frames):
        frame = xp[i * hop : i * hop + frame_len + tau_max]
        w = frame[:frame_len]
        cs = np.concatenate(([0.0], np.cumsum(frame**2)))
        r0 = cs[frame_len]
        if r0 < 1e-8:
            continue
        corr = np.correlate(frame, w, mode="valid")[: tau_max + 1]
        r_tau = cs[np.arange(tau_max + 1) + frame_len] - cs[np.arange(tau_max + 1)]
        d = r0 + r_tau - 2 * corr
        dprime = np.ones(tau_max + 1)
        csum = np.cumsum(d[1:])
        with np.errstate(divide="ignore", invalid="ignore"):
            dprime[1:] = d[1:] * np.arange(1, tau_max + 1) / np.where(csum > 0, csum, 1e-12)
        seg = dprime[tau_min : tau_max + 1]
        below = np.flatnonzero(seg < threshold)
        if below.size:
            tau = below[0] + tau_min
            while tau + 1 <= tau_max and dprime[tau + 1] < dprime[tau]:
                tau += 1
        else:
            tau = int(np.argmin(seg)) + tau_min
            if seg.min() > 0.5:
                continue
        if 1 <= tau < tau_max:
            a, b, c = dprime[tau - 1], dprime[tau], dprime[tau + 1]
            denom = a - 2 * b + c
            delta = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            delta = np.clip(delta, -0.5, 0.5)
        else:
            delta = 0.0
        f0[i] = sample_rate / (tau + delta)
    return f0.astype(np.float32)


def test_f0_vectorization_matches_scalar():
    """The batched rFFT implementation reproduces the per-frame loop on
    voiced+unvoiced+silent material (voicing decisions included)."""
    from mbexwn_vocoder_tpu.dsp.f0 import estimate_f0

    sr, hop = 24000, 300
    rng = np.random.RandomState(0)
    t = np.arange(sr * 2) / sr
    signals = [
        np.sin(2 * np.pi * 180 * t) * np.concatenate([np.zeros(sr // 2), np.ones(sr + sr // 2)]),
        rng.randn(sr) * 0.1,  # unvoiced noise
        np.zeros(sr // 2),    # silence
        np.sin(2 * np.pi * (120 + 80 * t) * t) + 0.05 * rng.randn(t.size),  # chirp + noise
    ]
    for sig in signals:
        got = estimate_f0(sig.astype(np.float32), sr, hop)
        ref = _estimate_f0_scalar(sig.astype(np.float32), sr, hop)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)


def test_segment_dataset(tmp_path):
    from mbexwn_vocoder_tpu.config import read_config
    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.training.data import SegmentDataset

    data_dir = _make_dataset(tmp_path)
    pc = read_config(mv.get_config_file("SPEECH"))["preprocess_config"]
    pc = dict(pc, segment_length=6000)
    ds = SegmentDataset(data_dir, pc, seed=1)
    batch = ds.batch(3)
    assert batch["audio"].shape == (3, 6000)
    assert batch["mel"].shape == (3, 6000 // 300 + 1, 80)
    assert batch["F0"].shape == (3, 6000)
    assert np.all(np.isfinite(batch["mel"]))


def test_synthetic_corpus_generator(tmp_path):
    """training/synthetic.py: voice-like wavs that the data pipeline accepts."""
    from mbexwn_vocoder_tpu.config import read_config
    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.training.data import SegmentDataset
    from mbexwn_vocoder_tpu.training.synthetic import make_corpus, synth_utterance

    out = str(tmp_path / "corpus")
    paths = make_corpus(out, n_utterances=2, seed=5, duration_range=(1.0, 1.4), quiet=True)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    rng = np.random.RandomState(0)
    audio, f0 = synth_utterance(rng, duration_s=1.2)
    assert np.all(np.isfinite(audio)) and np.abs(audio).max() <= 1.0
    # voiced content concentrates below 5 kHz (formant structure)
    spec = np.abs(np.fft.rfft(audio))
    freqs = np.fft.rfftfreq(audio.size, 1 / 24000)
    low = spec[(freqs > 80) & (freqs < 5000)].sum()
    high = spec[freqs >= 5000].sum()
    assert low > 2 * high
    # voiced frames carry F0 in the model's pp range
    voiced = f0[f0 > 0]
    assert voiced.size > 0.2 * f0.size
    assert voiced.min() > 40 and voiced.max() < 600

    pc = read_config(mv.get_config_file("SPEECH"))["preprocess_config"]
    ds = SegmentDataset(out, dict(pc, segment_length=6000), seed=1)
    batch = ds.batch(2)
    assert batch["audio"].shape == (2, 6000) and np.all(np.isfinite(batch["mel"]))


def test_synthetic_shifted_eval_variant(tmp_path):
    """shifted=True (the out-of-distribution eval leg of the quality gate):
    finite audio, F0 register disjoint from the base speech range, formants
    scaled up (more high-band energy than base at matched tilt ranges)."""
    from mbexwn_vocoder_tpu.training.synthetic import make_corpus, synth_utterance

    rng = np.random.RandomState(9)
    audio, f0 = synth_utterance(rng, duration_s=1.5, shifted=True)
    assert np.all(np.isfinite(audio)) and np.abs(audio).max() <= 1.0
    voiced = f0[f0 > 0]
    assert voiced.size > 0.2 * f0.size
    # shifted speech register: f0_base in (250, 360) vs base (90, 240); the
    # contour is bounded by 0.8..1.45 x base x declination, so it stays >180
    assert voiced.min() > 180, voiced.min()
    assert voiced.max() < 600

    # deterministic per seed and distinct from the unshifted draw
    rng2 = np.random.RandomState(9)
    audio2, _ = synth_utterance(rng2, duration_s=1.5, shifted=True)
    np.testing.assert_array_equal(audio, audio2)
    rng3 = np.random.RandomState(9)
    audio3, _ = synth_utterance(rng3, duration_s=1.5, shifted=False)
    assert audio.shape != audio3.shape or np.abs(audio - audio3).max() > 0

    out = str(tmp_path / "shift")
    paths = make_corpus(out, n_utterances=2, seed=8, duration_range=(1.0, 1.2),
                        quiet=True, shifted=True, style="mixed")
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_synthetic_singing_style(tmp_path):
    """style="singing": sustained voicing with vibrato-modulated note pitches
    (the SING/VOICE-family corpus); "mixed" alternates both styles."""
    from mbexwn_vocoder_tpu.training.synthetic import make_corpus, synth_utterance

    rng = np.random.RandomState(7)
    audio, f0 = synth_utterance(rng, duration_s=2.0, style="singing")
    assert np.all(np.isfinite(audio)) and np.abs(audio).max() <= 1.0
    voiced = f0[f0 > 0]
    # sustained phonation: much higher voicing duty cycle than speech style
    assert voiced.size > 0.5 * f0.size
    assert voiced.min() > 40 and voiced.max() < 600
    # vibrato: the F0 contour inside one long voiced span oscillates at 5-6.5
    # Hz — its spectrum must peak in the vibrato band, not at DC drift rates
    run, best = None, 0
    cur = 0
    for v in (f0 > 0).astype(int):
        cur = cur + 1 if v else 0
        if cur > best:
            best, run = cur, None
    assert best > 24000 * 0.3  # at least one 300 ms sustained note
    # pick the longest voiced run
    mask = f0 > 0
    spans, s = [], None
    for i, v in enumerate(mask):
        if v and s is None:
            s = i
        elif not v and s is not None:
            spans.append((s, i)); s = None
    if s is not None:
        spans.append((s, mask.size))
    s0, s1 = max(spans, key=lambda p: p[1] - p[0])
    seg = f0[s0:s1]
    seg = seg / seg.mean() - 1.0
    spec = np.abs(np.fft.rfft(seg * np.hanning(seg.size)))
    freqs = np.fft.rfftfreq(seg.size, 1 / 24000)
    vib = spec[(freqs > 4.0) & (freqs < 8.0)].max()
    hi = spec[(freqs > 10.0) & (freqs < 20.0)].max()
    assert vib > 2 * hi  # clear vibrato peak

    paths = make_corpus(str(tmp_path / "mix"), n_utterances=2, seed=3,
                        duration_range=(1.0, 1.2), quiet=True, style="mixed")
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    with pytest.raises(ValueError):
        synth_utterance(np.random.RandomState(0), duration_s=1.0, style="whisper")


def test_synthetic_voiced_fricative_balance():
    """balance="natural" (v2 corpora): voiced segments must sit well ABOVE
    the fricative noise, like real voices. The v1 "legacy" balance let
    fricative bursts dominate (voiced ~15 dB down after peak normalization),
    which made the mel-L1 quality gate partly measure noise resynthesis
    (round-3 diagnosis). Guards the v2 corpora against regressing to that."""
    import scipy.signal as ss

    from mbexwn_vocoder_tpu.training.synthetic import synth_utterance

    def voiced_over_unvoiced_db(audio, f0):
        env = np.abs(ss.hilbert(audio.astype(np.float64)))
        sm = ss.fftconvolve(env, np.ones(480) / 480, mode="same")
        act = sm > 0.02 * sm.max()
        voiced = f0 > 0
        if not (voiced & act).any() or not (~voiced & act).any():
            return None
        v = np.sqrt((audio[voiced & act] ** 2).mean())
        u = np.sqrt((audio[~voiced & act] ** 2).mean())
        return 20 * np.log10(v / (u + 1e-12))

    for style in ("speech", "singing"):
        ratios = []
        for seed in range(4):
            rng = np.random.RandomState(100 + seed)
            audio, f0 = synth_utterance(rng, duration_s=3.0, style=style)
            r = voiced_over_unvoiced_db(audio, f0)
            if r is not None:
                ratios.append(r)
        assert ratios and min(ratios) > 5.0, (style, ratios)

    # the legacy mode must keep reproducing the v1 imbalance (provenance of
    # pre-v2 published checkpoints depends on bit-exact regeneration)
    rng = np.random.RandomState(998)
    dur = rng.uniform(2.0, 4.0)
    a_leg, f_leg = synth_utterance(rng, duration_s=dur, style="singing", balance="legacy")
    rng2 = np.random.RandomState(998)
    dur2 = rng2.uniform(2.0, 4.0)
    a_leg2, _ = synth_utterance(rng2, duration_s=dur2, style="singing", balance="legacy")
    np.testing.assert_array_equal(a_leg, a_leg2)

    with pytest.raises(ValueError):
        synth_utterance(np.random.RandomState(0), duration_s=1.0, balance="loud")


def test_train_cli_end_to_end(tmp_path):
    """Run the real train CLI for a few steps on a tiny model; check metrics
    stream, checkpoint creation, resume, and inference-weight export."""
    from mbexwn_vocoder_tpu.cli.train import main as train_main
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    data_dir = _make_dataset(tmp_path)
    out_dir = str(tmp_path / "run")
    cargs = [
        "mbexwn_config:pp_mod_subnet:n_channels=16",
        "mbexwn_config:pp_mod_subnet:n_layers=2",
        "mbexwn_config:pp_mod_subnet:n_out_channels=8",
        "mbexwn_config:normalize_rms_from_mell=False",
        "preprocess_config:segment_length=6000",
    ]
    train_main("SPEECH", data_dir, out_dir, steps=4, batch_size=2, save_every=2,
               log_every=1, cargs=cargs, num_workers=1)

    # metrics stream exists and has finite losses
    mfile = os.path.join(out_dir, "logs", "metrics.jsonl")
    assert os.path.exists(mfile)
    recs = [json.loads(l) for l in open(mfile)]
    assert any(r["step"] == 4 for r in recs)
    assert all(np.isfinite(r["total_loss"]) for r in recs if "total_loss" in r)

    # checkpoints + export
    assert os.path.exists(os.path.join(out_dir, "weights.npz"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))

    # resume continues from the saved step
    train_main("SPEECH", data_dir, out_dir, steps=6, batch_size=2, save_every=2,
               log_every=1, cargs=cargs, num_workers=1)
    recs = [json.loads(l) for l in open(mfile)]
    assert any(r["step"] == 6 for r in recs)

    # replaying an already-reached --steps target is a pure-filesystem no-op
    # (the staged chain re-runs earlier legs; it must not rebuild the model
    # or claim a device) -- the done marker must still be printed
    import io
    from contextlib import redirect_stderr

    buf = io.StringIO()
    with redirect_stderr(buf):
        train_main("SPEECH", data_dir, out_dir, steps=6, batch_size=2, save_every=2,
                   log_every=1, cargs=cargs, num_workers=1)
    assert "nothing to train" in buf.getvalue()
    assert f"exported inference model to {out_dir}" in buf.getvalue()

    # the exported directory is a loadable model
    inv = MELInverter(out_dir)
    mel = np.random.RandomState(0).randn(1, 8, 80).astype(np.float32) * 0.5 - 4
    y = inv.synth_from_mel(mel)
    assert y.shape == (8 * 300,)
    assert np.all(np.isfinite(y))

    # killed-run export path: params restore from the Orbax checkpoint alone,
    # as host numpy, without a state template (tools/export_from_checkpoint.py)
    from mbexwn_vocoder_tpu.training.checkpointing import CheckpointManager

    params, step = CheckpointManager(os.path.join(out_dir, "checkpoints")).restore_params_only()
    assert step == 6
    flat = jax.tree_util.tree_leaves(params)
    assert flat and all(isinstance(l, np.ndarray) for l in flat)
    ref = dict(np.load(os.path.join(out_dir, "weights.npz")))
    some_key = sorted(k for k in ref if not k.startswith("__"))[0]
    leaf = params
    for part in some_key.split("/"):
        leaf = leaf[part]
    np.testing.assert_array_equal(np.asarray(leaf), ref[some_key])


def test_observability_helpers(tmp_path):
    from mbexwn_vocoder_tpu.observability import MetricsLogger, check_finite, model_summary, dump_controls
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    import mbexwn_vocoder_tpu as mv

    log = MetricsLogger(str(tmp_path), "m")
    log.log(1, {"a": 1.5, "b": np.float32(2.0)})
    log.close()
    recs = [json.loads(l) for l in open(log.path)]
    assert recs[0]["a"] == 1.5

    with pytest.raises(FloatingPointError):
        check_finite({"x": np.array([1.0, np.nan])}, "t")

    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    lines = []
    model_summary(model, params, T_mel=8, print_fn=lines.append)
    assert any("total params" in l for l in lines)

    mel = np.random.RandomState(0).randn(1, 8, 80).astype(np.float32) * 0.5 - 4
    dump_path = str(tmp_path / "controls.p")
    data = dump_controls(dump_path, model, params, mel)
    assert os.path.exists(dump_path)
    assert data["pulse_frequency"].shape == (1, 8 * 150)


def test_train_cli_with_pretrain_schedule_dither_td(tmp_path):
    """Config-contract extras: activation pretraining before step 1,
    lr_schedule, dither_level and TD loss keys all consumed."""
    from mbexwn_vocoder_tpu.cli.train import main as train_main

    data_dir = _make_dataset(tmp_path)
    out_dir = str(tmp_path / "run2")
    cargs = [
        "mbexwn_config:pp_mod_subnet:n_channels=16",
        "mbexwn_config:pp_mod_subnet:n_layers=2",
        "mbexwn_config:pp_mod_subnet:n_out_channels=8",
        "mbexwn_config:normalize_rms_from_mell=False",
        "preprocess_config:segment_length=6000",
        "training_config:pretrain_activations_target=1.0",
        "training_config:pretrain_activations_max_iters=3",
        "training_config:dither_level=0.001",
        "training_config:TD_loss_weight=0.5",
        "training_config:lr_schedule={'type':'cosine','warmup_steps':2,'decay_steps':100}",
    ]
    train_main("SPEECH", data_dir, out_dir, steps=2, batch_size=2, save_every=10,
               log_every=1, cargs=cargs, num_workers=1)
    recs = [json.loads(l) for l in open(os.path.join(out_dir, "logs", "metrics.jsonl"))]
    assert "TD_loss" in recs[-1]
    assert np.isfinite(recs[-1]["total_loss"])


def test_synthesis_flops_and_multihost_info():
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.observability import synthesis_flops
    from mbexwn_vocoder_tpu.parallel.multihost import process_info
    import mbexwn_vocoder_tpu as mv

    hp = read_config(mv.get_config_file("SPEECH"))
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    info = synthesis_flops(model, T_mel=128, batch=32)
    assert info["breakdown"]["wavenet"] > 1e12 * 0.9  # ~1.2 TFLOP at batch 32
    assert info["flops_per_audio_second"] > 1e10

    pi = process_info()
    assert pi["process_count"] >= 1 and pi["local_devices"] >= 1


def test_warm_start_fast_forwards_optimizer_count(tmp_path):
    """--init_from warm start: optimizer step counters must continue at
    --init_step (advisor round-4: a freshly init'd opt_state would replay an
    lr_schedule from step 0 despite init_step)."""
    import optax

    from mbexwn_vocoder_tpu.training.trainer import fast_forward_opt_state

    params = {"w": np.zeros((3,), np.float32)}
    sched = optax.cosine_decay_schedule(1e-4, 1000, alpha=0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    st = fast_forward_opt_state(tx.init(params), 700)

    def _counts(s, acc):
        if hasattr(s, "_fields"):
            if "count" in s._fields:
                acc.append(int(s.count))
        elif isinstance(s, tuple):
            for x in s:
                _counts(x, acc)
        return acc

    assert _counts(st, []) and all(c == 700 for c in _counts(st, []))

    # the next update really advances from step 700, not step 0
    grads = {"w": np.ones((3,), np.float32)}
    _, st2 = tx.update(grads, st, params)
    assert _counts(st2, []) and all(c == 701 for c in _counts(st2, []))
