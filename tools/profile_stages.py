#!/usr/bin/env python3
"""Per-stage on-chip timing of the flagship synthesis program.

Times each pipeline stage as its own jitted sub-program (distinct inputs,
fixed iteration counts, tiny slice readback as the sync point -- the
dedup-safe pattern from bench.py), plus the full fused program.  Because the
stages re-materialize their boundaries, the stage sum exceeds the fused step
time; the ratios are what matter.

Usage: python tools/profile_stages.py [--batch 32] [--tmel 128] [--iters 8]
Env:   MBEXWN_WN_DTYPE / MBEXWN_SUBNET_DTYPE=bfloat16 for the speed modes,
       MBEXWN_PLATFORM=cpu to smoke-test.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tmel", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--model", default="SPEECH")
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
    B, T = args.batch, args.tmel
    hop, stp = blk.spect_hop_size, blk.spect_to_pulse_upsampling_factor
    rng = np.random.RandomState(0)
    n_in = 4  # distinct inputs to defeat enqueue dedup

    mels = [jnp.asarray((rng.randn(B, T, 80) * 0.5 - 4).astype(np.float32)) for _ in range(n_in)]
    f0s = [
        jnp.asarray((140 + 40 * np.sin(np.linspace(0, 9, T * stp) + k)).astype(np.float32)[None, :]
                    * np.ones((B, 1), np.float32))
        for k in range(n_in)
    ]

    def _oscillator(params, f0):
        return blk._oscillate(params, f0)

    def _wavenet_only(params, x, mel):
        for bl in blk.pp_waveNetBlocks:
            x = bl(params[bl.name], (x, mel))
        return blk.wn_post_net(params["wn_post_net"], x)

    def _excitation(params, mel, f0):
        return blk.generate_excitation(params, mel, f0, rng=jax.random.PRNGKey(0))

    def _envelope(params, mel, f0):
        return blk.generate_specenv(params, mel, f0)

    def _f0(params, mel):
        return blk.generate_f0(params, mel)

    def _full(params, mel):
        return model.infer(params, mel, synth_length=T * hop)

    # channel layout / fold factor derived from the model (single source of
    # truth, models/mbexwn.py::wn_in_channels) -- handles PQMF folds and
    # subharmonic channels
    xs = [jnp.asarray(
              rng.randn(B, T * stp // blk.wn_fold_factor, blk.wn_in_channels).astype(np.float32)
              * 0.1)
          for _ in range(n_in)]

    stages = {
        "f0_subnet": (jax.jit(_f0), lambda k: (params, mels[k])),
        "oscillator": (jax.jit(_oscillator), lambda k: (params, f0s[k])),
        "wavenet_stack": (jax.jit(_wavenet_only), lambda k: (params, xs[k], mels[k])),
        "excitation_total": (jax.jit(_excitation), lambda k: (params, mels[k], f0s[k])),
        "envelope": (jax.jit(_envelope), lambda k: (params, mels[k], f0s[k])),
        "full_infer": (jax.jit(_full), lambda k: (params, mels[k])),
    }

    def sync(y):
        # the relay cannot read complex buffers back (UNIMPLEMENTED); sync on
        # a small real view instead
        leaf = jax.tree_util.tree_leaves(y)[0]
        if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
            leaf = jnp.real(leaf)
        return np.asarray(leaf.ravel()[:4])

    out = {"batch": B, "T_mel": T, "platform": jax.devices()[0].platform,
           # effective dtypes from the built model (env > config > fp32)
           "wn_dtype": str(blk.wn_compute_dtype or "float32"),
           "subnet_dtype": str(blk.subnet_compute_dtype or "float32")}
    audio_s = B * T * hop / blk.sample_rate
    for name, (fn, argf) in stages.items():
        t0 = time.time()
        _ = sync(fn(*argf(0)))
        compile_s = time.time() - t0
        for k in range(n_in):
            y = fn(*argf(k))
        _ = sync(y)
        t0 = time.time()
        for i in range(args.iters):
            y = fn(*argf(i % n_in))
        _ = sync(y)
        dt = (time.time() - t0) / args.iters
        out[name] = {"ms": round(dt * 1e3, 2), "compile_s": round(compile_s, 1)}
        print(f"{name:18s} {dt*1e3:8.2f} ms  (compile {compile_s:.0f} s)", file=sys.stderr)
    out["rtf_full"] = round(audio_s / (out["full_infer"]["ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
