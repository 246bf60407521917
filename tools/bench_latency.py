#!/usr/bin/env python3
"""Measure live low-latency streaming: per-chunk wall latency of the causal
chunk program at small chunk sizes (VERDICT r2 #3b).

Drives the same jitted chunk program `StreamingSynthesizer.stream()/synth()`
use (span = halo_frames + chunk + halo_right mel frames) on a force_causal
flagship config with halo_right=2 (the proven-minimal lookahead,
tests/test_parallel.py::test_causal_low_latency_chunked), and times each
chunk dispatch end-to-end: host call -> device compute -> full audio-chunk
readback.  That wall time plus the (chunk+2)-frame algorithmic lookahead is
the complete latency story of live synthesis.

Methodology (CLAUDE.md): distinct inputs per iteration, fixed iteration
counts, readback as the sync point; first call per shape is the compile and
is reported separately.
"""
import argparse
import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--halo", type=int, default=32)
    ap.add_argument("--halo_right", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--model", default="SPEECH")
    ap.add_argument("--out", default=None, help="write a JSON result file")
    args = ap.parse_args()

    from mbexwn_vocoder_tpu.platform import apply_platform_override

    apply_platform_override()
    import jax

    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.parallel import StreamingSynthesizer

    hp = read_config(mv.get_config_file(args.model))
    hp["mbexwn_config"]["force_causal"] = True
    hp["mbexwn_config"]["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(0), batch_size=1, T_mel=8)
    hop = hp["preprocess_config"]["hop_size"]
    sr = hp["preprocess_config"]["sample_rate"]

    rng = np.random.RandomState(0)
    results = []
    for c in args.chunks:
        ss = StreamingSynthesizer(model, params, chunk_frames=c, halo_frames=args.halo,
                                  halo_right=args.halo_right)
        span = args.halo + c + args.halo_right
        fn = ss._chunk_fn(span, args.halo, c)
        # distinct inputs: one mel span + carry per iteration
        mels = [jnp.asarray((rng.randn(1, span, 80) * 0.5 - 4).astype(np.float32))
                for _ in range(args.iters + 1)]
        carries = [jnp.asarray(rng.rand(1).astype(np.float32)) for _ in range(args.iters + 1)]

        t0 = time.perf_counter()
        a, f = fn(params, mels[0], carries[0])
        np.asarray(a)
        compile_s = time.perf_counter() - t0

        times = []
        for i in range(1, args.iters + 1):
            t0 = time.perf_counter()
            a, f = fn(params, mels[i], carries[i])
            np.asarray(a)  # full audio-chunk readback = what a live client needs
            np.asarray(f)  # interior F0 readback feeds the host phase carry
            times.append(time.perf_counter() - t0)
        times = np.asarray(times) * 1e3
        audio_ms = c * hop / sr * 1e3
        lookahead_ms = (args.halo_right * hop / sr) * 1e3
        row = {
            "chunk_frames": c,
            "audio_ms": round(audio_ms, 2),
            "compute_ms_p50": round(float(np.percentile(times, 50)), 2),
            "compute_ms_p95": round(float(np.percentile(times, 95)), 2),
            "algorithmic_lookahead_ms": round(lookahead_ms, 2),
            "total_latency_ms_p50": round(float(np.percentile(times, 50)) + lookahead_ms + audio_ms, 2),
            "rtf": round(audio_ms / float(np.percentile(times, 50)), 1),
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"halo": args.halo, "halo_right": args.halo_right,
                       "model": args.model, "rows": results}, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
