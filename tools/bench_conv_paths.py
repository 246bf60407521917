#!/usr/bin/env python3
"""A/B microbench: XLA conv_general_dilated vs tap-decomposed matmuls for the
WaveNet's dilated gated conv layer, at the flagship shapes.

A k=3 dilated conv is exactly
    y[t] = x[t-d] @ W0 + x[t] @ W1 + x[t+d] @ W2
so it can be issued as three (B*T, Cin) @ (Cin, Cout) dot_generals over
shifted strided slices -- sometimes a better MXU tiling than the conv
lowering.  This bench times a full gated layer (conv + gate + res/skip 1x1)
both ways on the real chip to decide which path the layer should use.
"""
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
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

    smoke = "--smoke" in sys.argv
    B, C = (2, 64) if smoke else (32, 320)
    T_list = (128,) if smoke else (3200, 6400)
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    results = {"dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype)}

    def gated_layer_conv(x, w_dil, w_rs, d):
        y = jax.lax.conv_general_dilated(
            x, w_dil, window_strides=(1,), padding=[(d, d)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        a, b = jnp.split(y, 2, axis=-1)
        g = jnp.tanh(a) * jax.nn.sigmoid(b)
        rs = jax.lax.conv_general_dilated(
            g, w_rs, window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        res, skip = jnp.split(rs, 2, axis=-1)
        return x + res, skip

    def gated_layer_matmul(x, w_dil, w_rs, d):
        T = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
        y = (
            jnp.einsum("btc,cd->btd", xp[:, :T], w_dil[0], preferred_element_type=x.dtype)
            + jnp.einsum("btc,cd->btd", xp[:, d : d + T], w_dil[1], preferred_element_type=x.dtype)
            + jnp.einsum("btc,cd->btd", xp[:, 2 * d : 2 * d + T], w_dil[2], preferred_element_type=x.dtype)
        )
        a, b = jnp.split(y, 2, axis=-1)
        g = jnp.tanh(a) * jax.nn.sigmoid(b)
        rs = jnp.einsum("btc,cd->btd", g, w_rs[0], preferred_element_type=x.dtype)
        res, skip = jnp.split(rs, 2, axis=-1)
        return x + res, skip

    def gated_layer_int8(x, w_dil, w_rs, d):
        # the shipped int8 serving path (ops/quant.py, MBEXWN_WN_QUANT=int8):
        # dynamic per-tensor activation quant + per-cout weight quant,
        # int8 matmuls with int32 accumulation
        from mbexwn_vocoder_tpu.ops.quant import conv1x1_int8, dilated_conv1d_k3_int8

        y = dilated_conv1d_k3_int8(x, w_dil, None, dilation=d).astype(x.dtype)
        a, b = jnp.split(y, 2, axis=-1)
        g = jnp.tanh(a) * jax.nn.sigmoid(b)
        rs = conv1x1_int8(g, w_rs, None).astype(x.dtype)
        res, skip = jnp.split(rs, 2, axis=-1)
        return x + res, skip

    layer_fns = {"conv": gated_layer_conv, "matmul": gated_layer_matmul,
                 "int8": gated_layer_int8}

    def stack(fn, x, weights, dils):
        skips = 0.0
        for (w_dil, w_rs), d in zip(weights, dils):
            x, skip = fn(x, w_dil, w_rs, d)
            skips = skips + skip
        return x, skips

    for T in T_list:
        n_layers = 12
        dils = [2 ** (i % 8) for i in range(n_layers)]
        weights = [
            (jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.05, dtype=dtype),
             jnp.asarray(rng.randn(1, C, 2 * C).astype(np.float32) * 0.05, dtype=dtype))
            for _ in range(n_layers)
        ]
        xs = [jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1, dtype=dtype) for _ in range(3)]

        for name, layer in layer_fns.items():
            fn = jax.jit(lambda x, layer=layer: stack(layer, x, weights, dils))
            t0 = time.time()
            y = fn(xs[0])
            _ = np.asarray(y[0].ravel()[:4].astype(jnp.float32))
            compile_s = time.time() - t0
            t0 = time.time()
            iters = 10
            for i in range(iters):
                y = fn(xs[i % 3])
            _ = np.asarray(y[0].ravel()[:4].astype(jnp.float32))
            dt = (time.time() - t0) / iters
            flops = B * T * n_layers * (3 * C * 2 * C + C * 2 * C) * 2
            results[f"T{T}_{name}"] = {"ms": round(dt * 1e3, 2),
                                       "tflops": round(flops / dt / 1e12, 1),
                                       "compile_s": round(compile_s, 1)}
            print(f"T={T} {name:7s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
