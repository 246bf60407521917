#!/usr/bin/env python3
"""Prime the persistent XLA compile cache with the SERVING programs.

The cold-start lesson (PERFORMANCE.md): the persistent cache keys on the
exact traced program, so a cache warmed by bench/profile runs does not cover
`MELInverter.synth_from_mel` — a deployment image must warm the cache with
the serving path itself.  This tool does exactly that: it loads a model and
compiles every (batch, length-bucket) serving program into --cache_dir, so a
container that bundles the resulting cache starts load-bound (~tens of
seconds through this image's relay; milliseconds-class on a PCIe host), not
compile-bound (~60-650 s per program).

Usage:
  python tools/prime_cache.py --model SPEECH [--buckets 512 1024]
      [--batches 1 8] [--cache_dir .jax_cache]
Run once per model the deployment serves; then ship the cache directory.
"""
import argparse
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SPEECH")
    ap.add_argument("--buckets", type=int, nargs="*", default=None,
                    help="length buckets to compile (default: the model's full set)")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8],
                    help="batch sizes to compile (1 = blocking path, 8 = the "
                         "default serving coalescing group)")
    ap.add_argument("--cache_dir", default=os.path.join(repo, ".jax_cache"))
    args = ap.parse_args()

    from mbexwn_vocoder_tpu.platform import apply_platform_override

    apply_platform_override()
    import jax

    os.makedirs(args.cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    inv = MELInverter(args.model)
    buckets = args.buckets or inv.length_buckets
    for batch in args.batches:
        for b in buckets:
            t0 = time.time()
            inv.warm(buckets=[b], batch_size=batch)
            print(f"primed model={args.model} batch={batch} bucket={b} "
                  f"in {time.time() - t0:.1f}s", flush=True)
    print(f"cache at {args.cache_dir}: "
          f"{sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(args.cache_dir) for f in fs) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
