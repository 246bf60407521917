"""Wavetable oscillator runtime: drift-stable phase accumulation and
band-limited table lookup with grid cross-fade.

reference: MBExWN_NVoc/vocoder/model/tf_wavetable.py:429-492 (chunked cumsum,
itself adapted from DDSP's angular_cumsum) and :495-638 (lookup/cross-fade).

TPU notes:
- the phase is a prefix sum over the whole utterance; computing it as one
  float32 cumsum drifts audibly on long signals, so it is computed chunkwise
  with mod-1 carried offsets -- the exact arithmetic of the reference so that
  outputs match sample-for-sample
- wavetables are tiny ((~512+1) x n_grid floats); the interpolating lookup is
  expressed as a tent-weight matmul so it rides the MXU with the whole table
  on-chip (see wavetable_lookup)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stable_cumsum_and_wrap(phase_velocity: jnp.ndarray, chunk_size: int = 1000) -> jnp.ndarray:
    """Accumulated phase mod 1 of shape (B, T), chunked to bound fp32 error.

    Splits time into chunks, cumsums each chunk, and stitches chunks with
    mod-1 offsets that are themselves accumulated mod 1 (tf_wavetable.py:457-492).
    """
    n_batch, n_time = phase_velocity.shape[0], phase_velocity.shape[1]
    remainder = n_time % chunk_size
    if remainder:
        pad = chunk_size - remainder
        phase_velocity = jnp.pad(phase_velocity, ((0, 0), (0, pad)))
    length = phase_velocity.shape[1]
    n_chunks = length // chunk_size

    chunks = phase_velocity.reshape(n_batch, n_chunks, chunk_size)
    phase = jnp.cumsum(chunks, axis=2)

    # offset of each chunk = accumulated (mod 1) final values of prior chunks
    offsets = phase[:, :, -1:] % 1.0
    offsets = jnp.pad(offsets, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    offsets = jnp.cumsum(offsets, axis=1) % 1.0

    phase = (phase + offsets) % 1.0
    phase = phase.reshape(n_batch, length)
    if remainder:
        phase = phase[:, :n_time]
    return phase


def wavetable_lookup(phase: jnp.ndarray, wavetables: jnp.ndarray, no_interp: bool = False,
                     block_t: int = 8192) -> jnp.ndarray:
    """Linear-interp lookup of (B, T) phases in (n_wavetable, n_grid) tables.

    Returns (B, T, n_grid): each grid column sampled at the same phase.
    reference: tf_wavetable.py:605-638

    TPU note: expressed as a tent-weight matmul instead of a gather.  Linear
    interpolation at position p is exactly sum_j max(0, 1-|p-j|) * wt[j], so
    the lookup becomes (T, n_wavetable) @ (n_wavetable, n_grid) -- an MXU
    matmul with the whole (tiny) wavetable resident on-chip.  Gathers of this
    size are pathologically slow to compile on the TPU backend and would
    serialize on the VPU anyway.  The T axis is processed in blocks to bound
    the transient tent-weight matrix.
    """
    n_wavetable = wavetables.shape[0]
    n_period = n_wavetable - 1
    phase_wt = phase * n_period
    centers = jnp.arange(n_wavetable, dtype=phase.dtype)

    def lookup_block(pw):
        if no_interp:
            w = (jnp.round(pw)[..., None] == centers).astype(wavetables.dtype)
        else:
            w = jnp.maximum(1.0 - jnp.abs(pw[..., None] - centers), 0.0)
        # HIGHEST: the tent weights carry the fractional phase; bf16-truncated
        # operands (TPU DEFAULT) would add an ~-60 dB floor to the excitation
        from .precision import sensitive_matmul_precision

        return jnp.einsum("btn,ng->btg", w, wavetables,
                          preferred_element_type=wavetables.dtype,
                          precision=sensitive_matmul_precision())

    T = phase_wt.shape[1]
    if T <= block_t or T % block_t != 0:
        return lookup_block(phase_wt)
    B = phase_wt.shape[0]
    nb = T // block_t
    blocks = phase_wt.reshape(B, nb, block_t).transpose(1, 0, 2)
    out = jax.lax.map(lookup_block, blocks)  # (nb, B, block_t, n_grid)
    return out.transpose(1, 0, 2, 3).reshape(B, T, wavetables.shape[1])


def grid_crossfade(
    audio_grid: jnp.ndarray,
    frequency: jnp.ndarray,
    nominal_f0: float,
    grid_factor: float,
    min_transposition: float,
    max_transposition: float,
) -> jnp.ndarray:
    """Cross-fade between adjacent grid tables with ReLU tent weights.

    audio_grid: (B, T, n_grid) lookup results; frequency: (B, T).
    reference: tf_wavetable.py:536-552
    """
    n_grid = audio_grid.shape[-1]
    log_ratio = jnp.log(
        jnp.clip(frequency / nominal_f0, min_transposition, max_transposition)
    )[..., None]
    norm = 1.0 / jnp.log(grid_factor)
    diff = log_ratio * norm - jnp.arange(n_grid, dtype=audio_grid.dtype)
    weights = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
    return jnp.sum(audio_grid * weights, axis=-1)


# ---------------------------------------------------------------------------
# pulse-synchronous gain (reference: tf_wavetable.py:561-600 hold mode,
# :642-712 per-pulse-average mode).
#
# The reference realizes both modes with boolean_mask + gather over flattened
# batches; on TPU both are expressed as associative "hold" scans (gather-free,
# O(log T) depth, fully batched).


def hold_last(values: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """out[t] = values[s] for the largest s <= t with mask[s] True.

    mask must be True at index 0 along `axis` (every sample has a preceding
    marked position).  The combine op (keep right value if right is marked)
    is associative, so this runs as a logarithmic-depth parallel scan.
    """

    def combine(a, b):
        av, am = a
        bv, bm = b
        return jnp.where(bm, bv, av), am | bm

    v, _ = jax.lax.associative_scan(combine, (values, mask), axis=axis)
    return v


def pulse_start_mask(wrapped_phase: jnp.ndarray) -> jnp.ndarray:
    """(B, T) bool mask, True at t=0 and wherever the mod-1 phase wraps
    (tf_wavetable.py:584-585)."""
    first = jnp.ones_like(wrapped_phase[:, :1], dtype=bool)
    return jnp.concatenate([first, wrapped_phase[:, 1:] < wrapped_phase[:, :-1]], axis=1)


def pulse_sync_gain_hold(wrapped_phase: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Sample `gain` at each pulse start and hold it over the pulse.

    reference: tf_wavetable.py:583-591 (boolean_mask + cumsum-index gather);
    here a single forward hold scan.
    """
    return hold_last(gain, pulse_start_mask(wrapped_phase))


def pulse_sync_gain_avg(wrapped_phase: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Replace `gain` by its mean over each pulse (segment between phase
    wraps; the trailing partial pulse is averaged over its own extent).

    reference: tf_wavetable.py:684-711 (flattened boolean_mask segment sums);
    here: segment mean = (csum_at_end - csum_before_start) / length with the
    four boundary quantities produced by forward/backward hold scans.
    """
    B, T = wrapped_phase.shape
    last = jnp.ones((B, 1), dtype=bool)
    # segment END at t: the phase wraps between t and t+1 (tf_wavetable.py:687)
    end = jnp.concatenate([wrapped_phase[:, :-1] > wrapped_phase[:, 1:], last], axis=1)
    start = jnp.concatenate([last, end[:, :-1]], axis=1)

    cs = jnp.cumsum(gain, axis=-1)
    excl = cs - gain
    idx = jnp.broadcast_to(jnp.arange(T, dtype=gain.dtype), (B, T))

    a = hold_last(excl, start)  # cumsum just before the segment start
    s = hold_last(idx, start)
    b = hold_last(cs[:, ::-1], end[:, ::-1])[:, ::-1]  # cumsum at segment end
    e = hold_last(idx[:, ::-1], end[:, ::-1])[:, ::-1]
    return (b - a) / (e - s + 1.0)
