"""Sequence-chunked long-form synthesis with exact oscillator phase carry.

The reference handles long signals with a fully variable time dimension plus
a drift-stable chunked cumsum (SURVEY §5).  Under XLA, shapes are static, so
long-form (e.g. 60 s) synthesis runs as a sequence of fixed-shape chunks:

- each chunk is evaluated on an extended span [t0-halo, t1+halo) of mel
  frames so every interior sample sees its full convolutional receptive
  field and STFT overlap (no boundary artefacts);
- the oscillator phase is a prefix sum over the WHOLE utterance; the phase
  at each chunk's left edge is carried across chunks in float64 mod-1
  arithmetic on the host (the TPU-side cumsum stays the reference-equivalent
  chunked float32 scheme, ops/oscillator.py) -- the same row-carry idea as
  tf_wavetable.py:477-483 applied at the chunk level;
- chunked output equals one-shot output up to float32 cumsum noise
  (property-tested in tests/test_parallel.py).

The same mechanism is the sequence-parallel (SP) decomposition: chunks are
independent given (mel span, phase offset), so they can also be dispatched to
different devices with the phase offsets precomputed from a cheap F0-only
pass; `synth` here runs them sequentially (streaming use).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StreamingSynthesizer:
    def __init__(self, model, params, chunk_frames: int = 256, halo_frames: int = 40, use_jit: bool = True):
        self.model = model
        self.params = params
        self.chunk_frames = chunk_frames
        self.halo_frames = halo_frames
        self.use_jit = use_jit
        self._jitted: Dict[Tuple[int, int, int], object] = {}
        blk = model.block
        self.stp = blk.spect_to_pulse_upsampling_factor
        self.hop = blk.spect_hop_size
        self.pulse_rate = blk.pulse_rate

    def _chunk_fn(self, span: int, left: int, inner: int):
        """Jitted chunk program: mel span -> (audio for [t0,t1), interior F0)."""
        key = (span, left, inner)
        if key not in self._jitted:
            model = self.model
            stp, hop = self.stp, self.hop

            def fn(params, mel_span, carry):
                # phase at the span start = carry (phase at frame t0) minus
                # the left-halo phase increment, from this span's own F0
                # (halo >= receptive field makes that F0 identical to the
                # one-shot contour there)
                f0 = model.block.generate_f0(params, mel_span)
                f0_left_inc = jnp.sum(f0[:, : left * stp], axis=1) / model.block.pulse_rate
                phase_offset = jnp.mod(carry - f0_left_inc, 1.0)
                y = model.infer(
                    params, mel_span, synth_length=mel_span.shape[1] * hop, phase_offset=phase_offset
                )
                a0 = left * hop
                audio = y[:, a0 : a0 + inner * hop]
                f0_interior = f0[:, left * stp : (left + inner) * stp]
                return audio, f0_interior

            self._jitted[key] = jax.jit(fn) if self.use_jit else fn
        return self._jitted[key]

    def synth(self, mell: np.ndarray) -> np.ndarray:
        """(B, T, C) log-mel -> (B, T*hop) waveform."""
        B, T, C = mell.shape
        c, h = self.chunk_frames, self.halo_frames
        if T <= c + h:
            y = self.model.infer(self.params, jnp.asarray(mell), synth_length=T * self.hop)
            return np.asarray(y)

        outs = []
        # carry: absolute phase (mod 1) just before frame t0's first pulse sample
        carry = np.zeros((B,), dtype=np.float64)
        t0 = 0
        while t0 < T:
            t1 = min(t0 + c, T)
            lo = max(0, t0 - h)
            hi = min(T, t1 + h)
            span = hi - lo
            left = t0 - lo
            inner = t1 - t0
            fn = self._chunk_fn(span, left, inner)
            mel_span = jnp.asarray(mell[:, lo:hi])
            audio, f0_interior = fn(self.params, mel_span, jnp.asarray(carry, dtype=jnp.float32))
            outs.append(np.asarray(audio))
            carry = np.mod(
                carry + np.sum(np.asarray(f0_interior, dtype=np.float64), axis=1) / self.pulse_rate, 1.0
            )
            t0 = t1
        return np.concatenate(outs, axis=1)
