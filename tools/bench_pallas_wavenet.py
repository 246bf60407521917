#!/usr/bin/env python3
"""TPU A/B: fused Pallas WaveNet stack vs XLA conv stack, flagship shapes."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("MBEXWN_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    except Exception:
        pass

    from mbexwn_vocoder_tpu.ops.pallas_wavenet import fused_wavenet_stack

    smoke = "--smoke" in sys.argv
    B, C = (2, 64) if smoke else (32, 320)
    T_list = (128,) if smoke else (3200, 6400)
    group_size = int(os.environ.get("PALLAS_GROUP", "4"))
    dtype = jnp.bfloat16
    dils = [2 ** (i % 8) for i in range(12)]
    rng = np.random.RandomState(0)
    results = {"group_size": group_size}

    def xla_stack(x, cond, weights):
        Cc = x.shape[-1]
        skip_total = 0.0
        for (wd, bd, wr, br), d in zip(weights, dils):
            wio = jnp.transpose(wd, (0, 1, 2))  # (3, C, 2C) already WIO
            y = jax.lax.conv_general_dilated(
                x, wio, window_strides=(1,), padding=[(d, d)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bd + cond
            g = jnp.tanh(y[..., :Cc]) * jax.nn.sigmoid(y[..., Cc:])
            rs = jax.lax.conv_general_dilated(
                g, wr[None], window_strides=(1,), padding=[(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + br
            x = x + rs[..., :Cc]
            skip_total = skip_total + rs[..., Cc:]
        return skip_total

    for T in T_list:
        weights = [
            (jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.05, dtype=dtype),
             jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.02, dtype=dtype),
             jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.05, dtype=dtype),
             jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.02, dtype=dtype))
            for _ in range(12)
        ]
        xs = [jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3, dtype=dtype) for _ in range(3)]
        conds = [jnp.asarray(rng.randn(B, T, 2 * C).astype(np.float32) * 0.2, dtype=dtype)
                 for _ in range(3)]

        fns = {
            "xla": jax.jit(lambda x, c: xla_stack(x, c, weights)),
            "pallas": jax.jit(lambda x, c: fused_wavenet_stack(x, c, weights, dils,
                                                               group_size=group_size)),
        }
        ref = None
        for name, fn in fns.items():
            t0 = time.time()
            y = fn(xs[0], conds[0])
            _ = np.asarray(y.astype(jnp.float32).ravel()[:4])
            compile_s = time.time() - t0
            # equivalence check between the two paths (bf16 tolerance)
            yf = np.asarray(y.astype(jnp.float32))
            if ref is None:
                ref = yf
            else:
                rel = float(np.sqrt(np.mean((yf - ref) ** 2) / (np.mean(ref**2) + 1e-12)))
                results[f"T{T}_rel_vs_xla"] = round(rel, 5)
            iters = 10
            t0 = time.time()
            for i in range(iters):
                y = fn(xs[i % 3], conds[i % 3])
            _ = np.asarray(y.astype(jnp.float32).ravel()[:4])
            dt = (time.time() - t0) / iters
            flops = 2 * B * T * 12 * (3 * C * 2 * C + C * 2 * C)
            results[f"T{T}_{name}"] = {"ms": round(dt * 1e3, 2),
                                       "tflops": round(flops / dt / 1e12, 1),
                                       "compile_s": round(compile_s, 1)}
            print(f"T={T} {name:7s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s "
                  f"(compile {compile_s:.0f}s)", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
