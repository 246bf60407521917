"""Pallas TPU kernel: fused wavetable lookup + grid cross-fade.

The XLA path (ops/oscillator.py) materializes a (B, T, n_wavetable) tent
weight matrix and a (B, T, n_grid) lookup result in HBM.  This kernel fuses
both: per time tile it builds the tent weights in VMEM, contracts them with
the wavetable (resident in VMEM, ~27 KB), applies the F0-dependent
cross-fade tent weights, and writes only the audio tile -- one HBM read of
phase/frequency and one write of audio.

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

_LANES = 128


def _osc_kernel(phase_ref, freq_ref, wt_ref, out_ref, *, n_period, log_grid_norm,
                nominal_f0, min_tr, max_tr):
    rows = phase_ref.shape[0]
    flat = rows * _LANES
    phase = phase_ref[:].reshape(flat, 1)
    freq = freq_ref[:].reshape(flat, 1)
    wt = wt_ref[:]                 # (n_wavetable, n_grid)
    n_wavetable = wt.shape[0]
    n_grid = wt.shape[1]

    pw = phase * n_period
    # TPU iota must be integer-typed; cast afterwards
    centers = jax.lax.broadcasted_iota(jnp.int32, (1, n_wavetable), 1).astype(jnp.float32)
    tent = jnp.maximum(1.0 - jnp.abs(pw - centers), 0.0)          # (flat, n_wavetable)
    grid_vals = jnp.dot(tent, wt, preferred_element_type=jnp.float32)  # (flat, n_grid)

    ratio = jnp.clip(freq / nominal_f0, min_tr, max_tr)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (1, n_grid), 1).astype(jnp.float32)
    diff = jnp.log(ratio) * log_grid_norm - gidx
    xfade = jnp.maximum(1.0 - jnp.abs(diff), 0.0)                 # (flat, n_grid)
    out_ref[:] = jnp.sum(grid_vals * xfade, axis=-1).reshape(rows, _LANES)


def oscillator_fused(phase: jnp.ndarray, frequency: jnp.ndarray, wavetables: jnp.ndarray,
                     nominal_f0: float, grid_factor: float, min_transposition: float,
                     max_transposition: float, block_rows: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """(B, T) phase/frequency + (n_wavetable, n_grid) tables -> (B, T) audio."""
    B, T = phase.shape
    n_period = wavetables.shape[0] - 1
    flat_len = B * T
    tile = block_rows * _LANES
    pad = (-flat_len) % tile
    phase_f = jnp.reshape(phase, (-1,))
    freq_f = jnp.reshape(frequency, (-1,))
    if pad:
        phase_f = jnp.pad(phase_f, (0, pad))
        freq_f = jnp.pad(freq_f, (0, pad), constant_values=nominal_f0)
    rows_total = phase_f.shape[0] // _LANES
    phase_2d = phase_f.reshape(rows_total, _LANES)
    freq_2d = freq_f.reshape(rows_total, _LANES)
    n_blocks = rows_total // block_rows

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
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wavetables.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(phase_2d.shape, jnp.float32),
        interpret=interpret,
    )(phase_2d, freq_2d, wavetables)
    out = out.reshape(-1)
    if pad:
        out = out[:flat_len]
    return out.reshape(B, T)
