#!/usr/bin/env python3
"""Batch-1 serving throughput: blocking loop vs depth-N async pipeline.

Measures BASELINE.md workload 1 the way a serving host experiences it: N
distinct ~5 s utterances, full waveform readback per request (that IS the
product of serving), end-to-end wall clock.  The pipelined mode keeps
`--depth` requests in flight so device compute overlaps host readback
(serving.py); the blocking mode is MELInverter.synth_from_mel in a loop —
the reference's serving shape (resynth_mel.py:333-394).

Usage: python tools/bench_serving.py [--model SPEECH] [--n 16] [--frames 400]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SPEECH")
    ap.add_argument("--n", type=int, default=16, help="number of utterances")
    ap.add_argument("--frames", type=int, default=400, help="mel frames per utterance (~5 s)")
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import jax

    if os.environ.get("MBEXWN_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from mbexwn_vocoder_tpu.mel_inverter import MELInverter
    from mbexwn_vocoder_tpu.serving import PipelinedSynthesizer

    inv = MELInverter(args.model)
    hop, sr = inv.hop_size, inv.srate
    bucket = next(b for b in inv.length_buckets if b >= args.frames)
    rng = np.random.RandomState(0)
    # distinct inputs: the relay dedupes identical async enqueues
    mels = [rng.randn(args.frames, 80).astype(np.float32) * 0.5 - 4.0 for _ in range(args.n)]
    audio_s = args.n * args.frames * hop / sr

    ps = PipelinedSynthesizer(inv.model, inv.params, length_buckets=inv.length_buckets,
                              depth=args.depth)
    ps.warm(buckets=[bucket])

    # blocking reference loop (shares the warmed jit cache via its own dict —
    # warm separately)
    inv.warm(buckets=[bucket])
    t0 = time.time()
    outs = [inv.synth_from_mel(m[None]) for m in mels]
    t_block = time.time() - t0

    t0 = time.time()
    outs_p = ps.map(mels)
    t_pipe = time.time() - t0

    for a, b in zip(outs, outs_p):
        np.testing.assert_array_equal(np.asarray(a), b)

    print(json.dumps({
        "metric": f"batch-1 serving ({args.n} x {args.frames * hop / sr:.1f}s utterances, full readback)",
        "blocking_rtf": round(audio_s / t_block, 1),
        "pipelined_rtf": round(audio_s / t_pipe, 1),
        "depth": args.depth,
        "speedup": round(t_block / t_pipe, 2),
    }))


if __name__ == "__main__":
    main()
