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


def main():
    t_start = time.time()
    import jax

    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    import mbexwn_vocoder_tpu as mv

    platform = jax.devices()[0].platform
    hp = read_config(mv.get_config_file("SPEECH"))
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    params = model.init(jax.random.PRNGKey(42), batch_size=1, T_mel=8)

    # (batch, mel-frames): single 6.4 s utterance + batch-32 x 1.6 s
    rtf_b1, compile_b1, dt_b1 = bench_config(model, params, B=1, T_mel=512)
    rtf_b32, compile_b32, dt_b32 = bench_config(model, params, B=32, T_mel=128)

    value = rtf_b32
    out = {
        "metric": "audio-seconds/s/chip (MW-SP-FD class model, 24 kHz resynthesis, batch 32)",
        "value": round(value, 1),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / BASELINE_RT, 2),
        "rtf_batch1": round(rtf_b1, 1),
        "rtf_batch32": round(rtf_b32, 1),
        "compile_s_batch1": round(compile_b1, 1),
        "step_ms_batch32": round(dt_b32 * 1e3, 1),
        "platform": platform,
        "n_devices": len(jax.devices()),
        "total_bench_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
