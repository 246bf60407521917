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
    ap.add_argument("--batch", type=int, default=None,
                    help="micro-batch size (default: the PipelinedSynthesizer "
                         "default, i.e. coalescing on)")
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

    kw = {} if args.batch is None else {"batch": args.batch}
    ps = PipelinedSynthesizer(inv.model, inv.params, length_buckets=inv.length_buckets,
                              depth=args.depth, **kw)
    # warm both the micro-batched and the flush-group shapes this run will hit
    import jax.numpy as jnp
    for b in sorted({min(ps.batch, args.n), args.n % ps.batch or ps.batch}):
        y = ps._fn(bucket)(ps.params, jnp.asarray(
            np.full((b, bucket, 80), -10.0, np.float32)))
        np.asarray(y[0, :4])

    # blocking reference loop (shares the warmed jit cache via its own dict —
    # warm separately)
    inv.warm(buckets=[bucket])
    t0 = time.time()
    outs = [inv.synth_from_mel(m[None]) for m in mels]
    t_block = time.time() - t0

    t0 = time.time()
    outs_p = ps.map(mels)
    t_pipe = time.time() - t0

    # device rate of the coalesced path: dispatch the same groups but read
    # back only a 4-sample slice per group (the bench.py readback convention)
    # — "effective device rate for N concurrent requests"
    # bucket-pad exactly like the pipeline does (serving.py _prep): the timed
    # dispatch must hit the warmed (B, bucket) program — an unpadded stack is
    # a different shape and would compile inside the timed region
    padded = [ps._prep(m[None])[0][0] for m in mels]
    groups = [padded[i : i + ps.batch] for i in range(0, args.n, ps.batch)]
    # pre-upload the stacked groups (bench.py dev_inputs convention): through
    # this image's ~10 MB/s loopback relay the 1.3 MB/group mel upload costs
    # ~130 ms — more than the synthesis step itself — and is a relay
    # artifact, not device rate (a PCIe host uploads it in ~1 ms)
    stacked = [jnp.asarray(np.stack(g, axis=0)) for g in groups]
    np.asarray(stacked[-1][0, :4, 0])  # sync uploads
    t0 = time.time()
    ys = [ps._fn(bucket)(ps.params, s) for s in stacked]
    for y in ys:
        np.asarray(y[0, :4])
    t_dev = time.time() - t0

    max_diff = 0.0
    for a, b in zip(outs, outs_p):
        a = np.asarray(a)
        assert a.shape == b.shape
        max_diff = max(max_diff, float(np.max(np.abs(a - b))))
    if ps.batch == 1:
        # identical program => bit-identical output required
        assert max_diff == 0.0, max_diff
    else:
        # batch-B program tiles convs differently than batch-1; outputs agree
        # to accumulation-order noise (waveform scale ~1; bf16 compute noise
        # through 24 conv layers can reach the 1e-2..1e-1 decade).  The exact
        # diff is recorded in the JSON line; fp32 parity lives in the tests.
        assert max_diff < 0.2, max_diff

    print(json.dumps({
        "metric": f"batch-1 serving ({args.n} x {args.frames * hop / sr:.1f}s utterances, full readback)",
        "blocking_rtf": round(audio_s / t_block, 1),
        "pipelined_rtf": round(audio_s / t_pipe, 1),
        "device_rtf_coalesced": round(audio_s / t_dev, 1),
        "depth": args.depth,
        "batch": ps.batch,
        "max_abs_diff_vs_blocking": max_diff,
        "speedup": round(t_block / t_pipe, 2),
    }))


if __name__ == "__main__":
    main()
