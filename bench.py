#!/usr/bin/env python3
"""Throughput benchmark: audio-seconds synthesized per wall-second per chip.

Runs the flagship SPEECH model (full 320-channel WaveNet) end-to-end
(mel -> waveform, one jitted XLA program) on the default JAX platform (the
real TPU chip when available; MBEXWN_PLATFORM=cpu to smoke-test).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is measured against the reference's best published figure,
200x real time on GPU (reference README.md:225; see BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RT = 200.0  # reference: up to 200x real time on GPU (README.md:225)


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache: a cold driver run pays the 90-250 s
    full-model compile at most once per shape; retries and later rounds hit
    the disk cache.  Must run before the first jax computation."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as exc:  # cache is best-effort; never fail the bench
        print(f"persistent compile cache unavailable: {exc}", file=sys.stderr)


def bench_config(model, params, B, T_mel, n_iters=16, n_inputs=4):
    """Steady-state throughput with DISTINCT inputs per call and a host
    readback at the end: the runtime dedupes identical async enqueues and
    block_until_ready alone does not bound a time-based loop, so a fixed
    iteration count over rotating inputs is the only honest measurement."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    hop = model.spect_hop_size
    sr = model.sample_rate

    def fn(params, mel):
        return model.infer(params, mel, synth_length=T_mel * hop)

    jfn = jax.jit(fn)
    rng = np.random.RandomState(0)
    mels = [
        jnp.asarray((rng.randn(B, T_mel, 80) * 0.5 - 4.0).astype(np.float32)) for _ in range(n_inputs)
    ]

    t0 = time.time()
    y = jfn(params, mels[0])
    _ = np.asarray(y[0, :4])
    compile_s = time.time() - t0

    # warm-up pass over all inputs
    for m in mels:
        y = jfn(params, m)
    _ = np.asarray(y[0, :4])

    t0 = time.time()
    for i in range(n_iters):
        y = jfn(params, mels[i % n_inputs])
    _ = np.asarray(y[0, :4])  # drains the full execution queue
    dt = (time.time() - t0) / n_iters

    audio_seconds = B * T_mel * hop / sr
    return audio_seconds / dt, compile_s, dt


def bench_longform(model, params, seconds=60, chunk_frames=512, halo_frames=48,
                   iters=3):
    """MW-VO-FD-class long-form streaming config (BASELINE.md workload 3).

    Two numbers per mode: `*_rtf` is the device synthesis rate measured the
    same way as the headline bench (iterated, distinct inputs, 4-float slice
    sync) and `*_e2e_rtf` includes the FULL waveform readback -- through this
    image's loopback relay the readback (~10 MB/s for 5.8 MB/min of audio)
    dominates, which is an artifact of the relay, not of the design; a real
    TPU host reads back over PCIe at GB/s.
    """
    import jax.numpy as jnp
    import numpy as np

    from mbexwn_vocoder_tpu.parallel import StreamingSynthesizer

    hop = model.spect_hop_size
    T = int(seconds * model.sample_rate / hop)
    rng = np.random.RandomState(0)
    n_in = 2
    mells = [(rng.randn(1, T, 80) * 0.5 - 4.0).astype(np.float32) for _ in range(n_in)]
    ss = StreamingSynthesizer(model, params, chunk_frames=chunk_frames, halo_frames=halo_frames)
    audio_s = T * hop / model.sample_rate

    def sync(y):
        if not isinstance(y, np.ndarray):  # full readback already syncs
            _ = np.asarray(y.ravel()[:4])

    def timed(fn, inputs, n=iters):
        sync(fn(inputs[0]))  # compile (synced -- async dispatch otherwise
        for m in inputs:     # leaks the warm execution into the timed window)
            y = fn(m)
        sync(y)
        t0 = time.time()
        for i in range(n):
            y = fn(inputs[i % len(inputs)])
        sync(y)
        return (time.time() - t0) / n

    out = {}
    # host-loop modes: the per-chunk host dispatch is integral, so e2e only
    out["sequential_e2e_rtf"] = audio_s / timed(ss.synth, mells)
    out["batched_e2e_rtf"] = audio_s / timed(ss.synth_batched, mells)

    # on-device scan: device rate (headline-consistent) and e2e with readback
    n_chunks = -(-T // chunk_frames)
    h = halo_frames
    halos = [np.pad(m, ((0, 0), (h, n_chunks * chunk_frames - T + h), (0, 0)), mode="edge")
             for m in mells]
    scan_fn = ss._scan_fn(n_chunks, 1)
    dev_inputs = [(jnp.asarray(m), jnp.asarray(mh)) for m, mh in zip(mells, halos)]
    out["scan_rtf"] = audio_s / timed(lambda t: scan_fn(params, t[0], t[1]), dev_inputs)
    out["scan_e2e_rtf"] = audio_s / timed(ss.synth_scan, mells)

    # streaming capacity: B concurrent bounded-latency streams in one scan
    # (measured sweep on the flagship SPEECH config: 8 streams -> 497x,
    #  16 -> 650x aggregate; 16 keeps per-chunk latency under the chunk span;
    #  32 OOMs HBM.  MBEXWN_CAP_STREAMS probes other counts, e.g. 24.)
    B_cap = int(os.environ.get("MBEXWN_CAP_STREAMS", "16"))
    mells_b = [(rng.randn(B_cap, T, 80) * 0.5 - 4.0).astype(np.float32) for _ in range(n_in)]
    halos_b = [np.pad(m, ((0, 0), (h, n_chunks * chunk_frames - T + h), (0, 0)), mode="edge")
               for m in mells_b]
    scan_fn_b = ss._scan_fn(n_chunks, B_cap)
    dev_b = [(jnp.asarray(m), jnp.asarray(mh)) for m, mh in zip(mells_b, halos_b)]
    out["capacity_rtf"] = B_cap * audio_s / timed(lambda t: scan_fn_b(params, t[0], t[1]), dev_b)
    out["capacity_streams"] = B_cap
    return out


def bench_scaling(n_list=(1, 2, 4, 8)):
    """Weak-scaling harness on a virtual device mesh (one utterance per
    device, constant per-device work).  On a multi-chip slice the same code
    measures real ICI scaling; single-chip images exercise it on the CPU
    backend (8 virtual devices)."""
    import json

    import jax
    import numpy as np

    # decide the platform BEFORE any backend init: querying devices would
    # claim the (single-tenant) TPU even when we immediately fall back to the
    # virtual CPU mesh
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    elif jax.device_count() < max(n_list):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    import mbexwn_vocoder_tpu as mv

    # full flagship config: weak-scaling numbers describe the real model
    # (on a single-chip image this runs on the virtual CPU mesh, which
    # validates sharding/collective correctness and per-device balance, not
    # ICI bandwidth -- the platform is reported with the numbers)
    hp = read_config(mv.get_config_file("SPEECH"))
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(42), batch_size=1, T_mel=8)
    T_mel = 32
    n_iters = 3
    rng = np.random.RandomState(0)
    results = {}
    base = None
    for n in n_list:
        if n > jax.device_count():
            break
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        mel = jnp.asarray((rng.randn(n, T_mel, 80) * 0.5 - 4).astype(np.float32))

        def fn(params, mel):
            mel = jax.lax.with_sharding_constraint(mel, NamedSharding(mesh, P("data")))
            return model.infer(params, mel, synth_length=T_mel * model.spect_hop_size)

        with mesh:
            jfn = jax.jit(fn)
            y = jfn(params, mel)
            _ = np.asarray(y[0, :4])
            t0 = time.time()
            for _i in range(n_iters):
                y = jfn(params, mel)
            _ = np.asarray(y[0, :4])
            dt = (time.time() - t0) / n_iters
        thr = n * T_mel * model.spect_hop_size / model.sample_rate / dt
        if base is None:
            base = thr
        results[n] = {"audio_s_per_s": round(thr, 2), "weak_scaling_eff": round(thr / (base * n), 3)}
    print(json.dumps({"scaling": results, "model": "flagship SPEECH 320ch",
                      "platform": jax.devices()[0].platform}))


def run_one(B, T_mel):
    """Bench a single (B, T_mel) config; prints one JSON line."""
    import jax

    _enable_persistent_compile_cache()

    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    import mbexwn_vocoder_tpu as mv

    hp = read_config(mv.get_config_file("SPEECH"))
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(42), batch_size=1, T_mel=8)
    rtf, compile_s, dt = bench_config(model, params, B=B, T_mel=T_mel)
    print(json.dumps({"rtf": round(rtf, 1), "compile_s": round(compile_s, 1),
                      "step_ms": round(dt * 1e3, 2), "platform": jax.devices()[0].platform}))


def main():
    """Run each config in a fresh subprocess with a timeout: the remote
    compile service wedges occasionally and a stuck compile cannot be
    interrupted in-process; subprocess isolation keeps the bench bounded.
    The headline batch-32 config runs first (and is retried once)."""
    import subprocess

    t_start = time.time()

    # single-tenant interlock: never race the repo's own training chain /
    # measurement queues for the TPU (the round-4 driver bench did exactly
    # that and the captured b1 halved).  Held for the whole bench, including
    # the subprocess legs.  MBEXWN_TPU_LOCK=0 disables (CPU smoke tests).
    lock = None
    if os.environ.get("MBEXWN_PLATFORM") != "cpu" and os.environ.get("MBEXWN_TPU_LOCK", "1") != "0":
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
            from tpu_lock import acquire_tpu_lock
        except ImportError:  # tests monkeypatch the path layer; never fatal
            acquire_tpu_lock = None
        if acquire_tpu_lock is not None:
            try:
                lock = acquire_tpu_lock(timeout_s=float(os.environ.get("MBEXWN_TPU_LOCK_TIMEOUT_S", "3600")),
                                        label="bench.py")
            except TimeoutError as exc:
                print(f"bench: {exc}", file=sys.stderr)
                cache_path_ = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")
                if os.path.exists(cache_path_):
                    out = json.load(open(cache_path_))
                    out["stale_cache"] = True
                    out["tpu_lock_timeout"] = True
                    print(json.dumps(out))
                    return
                raise

    def sub(B, T_mel, timeout_s=600, retries=1):
        for attempt in range(retries + 1):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one", str(B), str(T_mel)],
                    capture_output=True, text=True, timeout=timeout_s,
                )
                for line in reversed(r.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        return json.loads(line)
            except subprocess.TimeoutExpired:
                pass
            time.sleep(60)  # let the single-tenant claim/compile queue drain
        return None

    # fast-fail path: when the device backend is unreachable (the relay
    # tunnel can die), every jax-touching subprocess hangs in the plugin's
    # connect loop until its timeout — probe once (first TPU claim is ~11 s
    # healthy) and fall straight back to the last good measurement instead
    # of burning 3x900 s to learn the same thing
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=240,
        )
        backend_ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        backend_ok = False
    if not backend_ok and os.path.exists(cache_path):
        out = json.load(open(cache_path))
        out["stale_cache"] = True
        out["backend_unreachable"] = True
        out["total_bench_s"] = round(time.time() - t_start, 1)
        print(json.dumps(out))
        return

    # the full-model compile is 90-250 s/shape on a cold persistent cache and
    # the remote-compile service can wedge; 900 s + one retry bounds the
    # worst case while still capturing batch 32 cold
    b32 = sub(32, 128, timeout_s=900)
    b1 = sub(1, 512, timeout_s=900, retries=0)

    if b32 is None and b1 is None and os.path.exists(cache_path):
        # the single-tenant remote-compile service wedges occasionally; fall
        # back to the last successful measurement, explicitly flagged
        out = json.load(open(cache_path))
        out["stale_cache"] = True
        out["total_bench_s"] = round(time.time() - t_start, 1)
        print(json.dumps(out))
        return

    # label the headline with the batch that actually produced it -- never
    # publish a batch-1 number under a batch-32 metric string
    value = b32["rtf"] if b32 else (b1["rtf"] if b1 else 0.0)
    batch_label = "batch 32" if b32 else ("batch 1" if b1 else "no measurement")
    out = {
        "metric": f"audio-seconds/s/chip (MW-SP-FD class model, 24 kHz resynthesis, {batch_label})",
        "value": value,
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / BASELINE_RT, 2),
        "rtf_batch1": b1["rtf"] if b1 else None,
        "rtf_batch32": b32["rtf"] if b32 else None,
        "compile_s_batch32": b32["compile_s"] if b32 else None,
        "step_ms_batch32": b32["step_ms"] if b32 else None,
        "platform": (b32 or b1 or {}).get("platform", "unknown"),
        "total_bench_s": round(time.time() - t_start, 1),
    }
    if b32 or b1:
        try:
            json.dump(out, open(cache_path, "w"))
        except OSError:
            pass
    print(json.dumps(out))
    if lock is not None:
        # relay cooldown: the next claimant needs the device quiet >=60 s
        # after our last TPU subprocess exited; hold the lock through it so
        # a waiting training leg cannot wedge itself on a half-torn-down
        # device (CLAUDE.md "TPU runtime")
        time.sleep(60)
        lock.close()


if __name__ == "__main__":
    import sys as _sys

    if "--one" in _sys.argv:
        i = _sys.argv.index("--one")
        run_one(int(_sys.argv[i + 1]), int(_sys.argv[i + 2]))
    elif "--scaling" in _sys.argv:
        # virtual 8-device CPU mesh on single-chip images (must precede the
        # first jax import); bench_scaling switches jax_platforms itself
        if "jax" not in _sys.modules:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
            )
        bench_scaling()
    elif "--longform" in _sys.argv:
        import jax as _jax

        _enable_persistent_compile_cache()

        from mbexwn_vocoder_tpu.config import read_config as _rc
        from mbexwn_vocoder_tpu.models import create_model as _cm
        import mbexwn_vocoder_tpu as _mv

        _hp = _rc(_mv.get_config_file("VOICE"))
        _model, _ = _cm(_hp, _hp["training_config"], _hp["preprocess_config"], quiet=True)
        _params = _model.init(_jax.random.PRNGKey(42), batch_size=1, T_mel=8)
        if "--chunk_sweep" in _sys.argv:
            # bounded-latency tradeoff: chunk size vs single-stream RT factor
            from mbexwn_vocoder_tpu.parallel import StreamingSynthesizer as _SS
            import numpy as _np

            import jax.numpy as _jnp

            hop = _model.spect_hop_size
            T = int(60 * _model.sample_rate / hop)
            # device-rate methodology (same as bench_longform's scan_rtf):
            # distinct inputs + fixed iteration count + 4-float slice sync —
            # synth_scan()'s full readback would drown every chunk size in
            # the ~10 MB/s relay transfer (and identical repeated inputs get
            # deduped by the relay's async-enqueue cache)
            rng = _np.random.RandomState(0)
            mells = [(rng.randn(1, T, 80) * 0.5 - 4).astype(_np.float32) for _ in range(2)]
            rows = {}
            for cf in (128, 256, 512, 1024):
                ss = _SS(_model, _params, chunk_frames=cf, halo_frames=48)
                n_chunks = -(-T // cf)
                h = 48
                halos = [_np.pad(m, ((0, 0), (h, n_chunks * cf - T + h), (0, 0)), mode="edge")
                         for m in mells]
                fn = ss._scan_fn(n_chunks, 1)
                dev = [(_jnp.asarray(m), _jnp.asarray(mh)) for m, mh in zip(mells, halos)]
                y = fn(_params, *dev[0])
                _np.asarray(y.ravel()[:4])  # compile + sync
                iters = 3
                t0 = time.time()
                for i in range(iters):
                    y = fn(_params, *dev[i % len(dev)])
                _np.asarray(y.ravel()[:4])
                dt = (time.time() - t0) / iters
                rows[cf] = {"rtf": round(T * hop / _model.sample_rate / dt, 1),
                            "latency_s": round(cf * hop / _model.sample_rate, 2)}
            print(json.dumps({"metric": "streaming chunk sweep (60s, scan, device rate)", "rows": rows}))
        else:
            res = bench_longform(_model, _params)
            best = max(res["scan_rtf"], res["capacity_rtf"])
            print(json.dumps({"metric": "long-form 60s streaming", "value": round(best, 1),
                              "unit": "audio_s/s/chip",
                              **{k: round(v, 2) for k, v in res.items()}}))
    else:
        main()
