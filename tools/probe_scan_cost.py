#!/usr/bin/env python3
"""Isolate where the synth_scan long-form path loses throughput.

Times, for the flagship config on the current backend:
  A. model.infer on one (B, span) chunk, default path (predicted F0)
  B. model.infer on one (B, span) chunk with injected F0 + phase_offset
     (exactly the scan body's call)
  C. the full n_chunks lax.scan (synth_scan's program)
  D. one-shot model.infer on the whole (B, T) mel

If C >> n_chunks * B_step, the scan construct itself is the problem;
if B >> A, the F0-injection path is the problem; if A ~ C/n_chunks but
A >> D/n_chunks, chunk-shape inefficiency (halo recompute, shape-dependent
conv algorithms) is the problem.

Usage: python tools/probe_scan_cost.py [--model SPEECH] [--batch 1]
       [--chunk 512] [--halo 48] [--seconds 60] [--iters 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SPEECH")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--halo", type=int, default=48)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--stages", default="ABCD", help="subset of ABCD to run (D at B>1 can OOM)")
    args = ap.parse_args()

    if os.environ.get("MBEXWN_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.parallel import StreamingSynthesizer

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    hp = read_config(mv.get_config_file(args.model))
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(42), batch_size=1, T_mel=8)
    blk = model.block
    hop, stp = blk.spect_hop_size, blk.spect_to_pulse_upsampling_factor
    B, c, h = args.batch, args.chunk, args.halo
    span = c + 2 * h
    T = int(args.seconds * model.sample_rate / hop)
    n_chunks = -(-T // c)
    rng = np.random.RandomState(0)
    n_in = 4

    def sync(y):
        return np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:4])

    def timeit(fn, argf, iters):
        sync(fn(*argf(0)))  # compile
        for k in range(n_in):
            y = fn(*argf(k))
        sync(y)
        t0 = time.time()
        for i in range(iters):
            y = fn(*argf(i % n_in))
        sync(y)
        return (time.time() - t0) / iters

    spans = [jnp.asarray((rng.randn(B, span, 80) * 0.5 - 4).astype(np.float32)) for _ in range(n_in)]
    f0s = [jnp.asarray((140 + 40 * np.sin(np.linspace(0, 9, span * stp) + k)).astype(np.float32)[None]
                       * np.ones((B, 1), np.float32)) for k in range(n_in)]
    offs = [jnp.asarray(((0.1 * k) * np.ones(B)).astype(np.float32)) for k in range(n_in)]

    out = {"model": args.model, "batch": B, "chunk": c, "halo": h, "span": span,
           "n_chunks": n_chunks, "platform": jax.devices()[0].platform}

    if "A" in args.stages:
        fA = jax.jit(lambda p, m: model.infer(p, m, synth_length=span * hop))
        out["A_chunk_default_ms"] = round(
            timeit(fA, lambda k: (params, spans[k]), args.iters) * 1e3, 2)

    if "B" in args.stages:
        fB = jax.jit(lambda p, m, f0, o: model.infer(p, m, synth_length=span * hop, F0=f0,
                                                     phase_offset=o))
        out["B_chunk_injected_ms"] = round(
            timeit(fB, lambda k: (params, spans[k], f0s[k], offs[k]), args.iters) * 1e3, 2)

    ss = StreamingSynthesizer(model, params, chunk_frames=c, halo_frames=h)
    mells = [(rng.randn(B, T, 80) * 0.5 - 4).astype(np.float32) for _ in range(n_in)]
    mells_j = [jnp.asarray(m) for m in mells]
    audio_s = B * T * hop / model.sample_rate
    if "C" in args.stages:
        fn_scan = ss._scan_fn(n_chunks, B)
        halos = [jnp.asarray(np.pad(m, ((0, 0), (h, n_chunks * c - T + h), (0, 0)), mode="edge"))
                 for m in mells]
        out["C_scan_total_ms"] = round(
            timeit(fn_scan, lambda k: (params, mells_j[k], halos[k]), args.iters) * 1e3, 2)
        out["C_scan_per_chunk_ms"] = round(out["C_scan_total_ms"] / n_chunks, 2)
        out["rtf_scan"] = round(audio_s / (out["C_scan_total_ms"] / 1e3), 1)

    if "D" in args.stages:
        fD = jax.jit(lambda p, m: model.infer(p, m, synth_length=T * hop))
        out["D_oneshot_total_ms"] = round(
            timeit(fD, lambda k: (params, mells_j[k]), args.iters) * 1e3, 2)
        out["rtf_oneshot"] = round(audio_s / (out["D_oneshot_total_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
