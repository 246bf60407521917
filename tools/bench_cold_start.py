#!/usr/bin/env python3
"""Cold-start serving: time from process start to FIRST audio (VERDICT r2 #9).

Simulates a fresh deployment by pointing the XLA persistent compile cache at
a throwaway directory (never touches the repo's warm .jax_cache), then loads
the shipped SPEECH checkpoint through MELInverter and synthesizes one 5 s
utterance at the 512-frame serving bucket.

  --mode conv    default XLA conv WaveNet stack
  --mode pallas  MBEXWN_PALLAS_WN=1 fused stack (~40x faster compiles through
                 this image's remote-compile relay; runtime parity)
  --mode warm    keep the repo .jax_cache (the warm-cache reference point)

The round-3 lesson (PERFORMANCE.md cold-start section): the persistent cache
keys on the exact traced program, so a cache warmed by bench.py/profile runs
does NOT cover the MELInverter serving program — a "warm" leg only measures
a true warm start if a previous run of THIS script (same mode, same shapes)
populated the cache.  Recipe: run `--mode warm` twice; the first primes (and
measures the miss), the second measures the real warm start.  --explain
turns on jax_explain_cache_misses so a miss names the uncached computation.

Prints one JSON line: {"mode", "time_to_first_audio_s", "synth_s", ...}.
Run modes in separate processes with >=60 s between them (single-tenant TPU).
"""
import argparse
import json
import os
import sys
import tempfile
import time

T_PROC0 = time.time()

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("conv", "pallas", "warm"), required=True)
    ap.add_argument("--model", default="SPEECH")
    ap.add_argument("--frames", type=int, default=400, help="true mel length (bucket pads to 512)")
    ap.add_argument("--explain", action="store_true",
                    help="log persistent-cache misses (jax_explain_cache_misses)")
    args = ap.parse_args()

    if args.mode == "pallas":
        os.environ["MBEXWN_PALLAS_WN"] = "1"
    elif args.mode == "conv":
        # pin the conv path: the default "auto" routing would pick the Pallas
        # kernel for this batch-1 program on TPU and contaminate the A/B
        os.environ["MBEXWN_PALLAS_WN"] = "0"

    from mbexwn_vocoder_tpu.platform import apply_platform_override

    apply_platform_override()
    import jax

    if args.mode == "warm":
        cache_dir = os.path.join(repo, ".jax_cache")
    else:
        cache_dir = tempfile.mkdtemp(prefix="mbexwn_coldcache_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.explain:
        try:
            jax.config.update("jax_explain_cache_misses", True)
        except Exception as e:
            print(f"explain_cache_misses unavailable: {e}", file=sys.stderr)

    import numpy as np

    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    inv = MELInverter(args.model)
    t_loaded = time.time()

    rng = np.random.RandomState(0)
    mell = (rng.randn(1, args.frames, 80) * 0.5 - 4).astype(np.float32)
    y = inv.synth_from_mel(mell)  # includes the compile: the cold path
    t_first = time.time()
    assert np.all(np.isfinite(y)) and y.size == args.frames * inv.hop_size

    # steady-state for contrast (distinct input)
    mell2 = (rng.randn(1, args.frames, 80) * 0.5 - 4).astype(np.float32)
    t0 = time.time()
    y2 = inv.synth_from_mel(mell2)
    synth_s = time.time() - t0

    print(json.dumps({
        "mode": args.mode,
        "time_to_first_audio_s": round(t_first - T_PROC0, 1),
        "load_s": round(t_loaded - T_PROC0, 1),
        "compile_plus_first_synth_s": round(t_first - t_loaded, 1),
        "steady_synth_s": round(synth_s, 3),
        "audio_s": round(args.frames * inv.hop_size / inv.srate, 2),
        "platform": __import__("jax").devices()[0].platform,
        "cache_dir": cache_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
