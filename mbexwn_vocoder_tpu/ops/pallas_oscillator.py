"""Pallas TPU kernel: fused wavetable lookup + grid cross-fade.

The XLA path (ops/oscillator.py) materializes a (B, T, n_wavetable) tent
weight matrix and a (B, T, n_grid) lookup result in HBM.  This kernel fuses
both: per time tile it builds the tent weights in VMEM, contracts them with
the wavetable (resident in VMEM, ~27 KB), applies the F0-dependent
cross-fade tent weights, and writes only the audio tile -- one HBM read of
phase/frequency and one write of audio.

Mosaic-friendly formulation (no reshapes/transposes inside the kernel):
samples ride the LANE axis as (1, tile); the tent matrix is built
(n_wavetable, tile) by broadcasting an integer sublane iota against the
phase row; the wavetable is contracted from the left as
(n_grid, n_wavetable) @ (n_wavetable, tile); the cross-fade collapses the
n_grid sublanes.  Everything is a plain 2-D broadcast or matmul.

Semantics identical to wavetable_lookup + grid_crossfade (verified in
tests/test_pallas_kernels.py, interpret mode on CPU + compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _osc_kernel(phase_ref, freq_ref, wt_t_ref, out_ref, *, n_period, log_grid_norm,
                nominal_f0, min_tr, max_tr):
    phase = phase_ref[:]           # (1, tile)
    freq = freq_ref[:]             # (1, tile)
    wt_t = wt_t_ref[:]             # (n_grid, n_wavetable)
    n_grid, n_wavetable = wt_t.shape

    pw = phase * n_period
    j = jax.lax.broadcasted_iota(jnp.int32, (n_wavetable, 1), 0).astype(jnp.float32)
    tent = jnp.maximum(1.0 - jnp.abs(pw - j), 0.0)            # (n_wavetable, tile)
    grid_vals = jnp.dot(wt_t, tent, preferred_element_type=jnp.float32)  # (n_grid, tile)

    ratio = jnp.clip(freq / nominal_f0, min_tr, max_tr)
    g = jax.lax.broadcasted_iota(jnp.int32, (n_grid, 1), 0).astype(jnp.float32)
    xfade = jnp.maximum(1.0 - jnp.abs(jnp.log(ratio) * log_grid_norm - g), 0.0)  # (n_grid, tile)
    out_ref[:] = jnp.sum(grid_vals * xfade, axis=0, keepdims=True)  # (1, tile)


def oscillator_fused(phase: jnp.ndarray, frequency: jnp.ndarray, wavetables: jnp.ndarray,
                     nominal_f0: float, grid_factor: float, min_transposition: float,
                     max_transposition: float, tile: int = 2048,
                     interpret: bool = False) -> jnp.ndarray:
    """(B, T) phase/frequency + (n_wavetable, n_grid) tables -> (B, T) audio."""
    B, T = phase.shape
    n_period = wavetables.shape[0] - 1
    flat_len = B * T
    pad = (-flat_len) % tile
    phase_f = jnp.reshape(phase, (1, -1))
    freq_f = jnp.reshape(frequency, (1, -1))
    if pad:
        phase_f = jnp.pad(phase_f, ((0, 0), (0, pad)))
        freq_f = jnp.pad(freq_f, ((0, 0), (0, pad)), constant_values=nominal_f0)
    n_blocks = phase_f.shape[1] // tile
    wt_t = wavetables.T  # (n_grid, n_wavetable)

    kernel = functools.partial(
        _osc_kernel,
        n_period=float(n_period),
        log_grid_norm=float(1.0 / np.log(grid_factor)),
        nominal_f0=float(nominal_f0),
        min_tr=float(min_transposition),
        max_tr=float(max_transposition),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(wt_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(phase_f.shape, jnp.float32),
        interpret=interpret,
    )(phase_f, freq_f, wt_t)
    out = out.reshape(-1)
    if pad:
        out = out[:flat_len]
    return out.reshape(B, T)
