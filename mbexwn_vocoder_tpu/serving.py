"""Low-latency single-utterance serving: a depth-bounded software pipeline.

BASELINE.md workload 1 (single-utterance resynthesis) is *dispatch/readback*
bound at batch 1 on this runtime, not compute bound: the device finishes a
5 s utterance in ~10 ms while the host pays mel feed + full-waveform
readback through the relay before it dispatches the next request.  JAX
dispatch is asynchronous, so the fix is a classic software pipeline: keep
``depth`` requests in flight and block only on the oldest.  The host feed of
request i+depth, the device compute of i+1…i+depth-1, and the readback of
request i then overlap; steady-state throughput approaches
max(compute, readback) instead of their sum.

The reference serves utterances strictly sequentially (one analyze→synth→
write iteration per file, reference resynth_mel.py:333-394); this module is
the TPU-native replacement for that loop.  `cli/resynth_mel.py --pipeline`
drives it end to end.

Design notes:
- One jitted program per (length-bucket) shape, shared with the rest of the
  stack (static shapes; edge-padded tails trimmed after readback — same
  convention as MELInverter.synth_from_mel).
- No threads: JAX's async dispatch IS the second "thread"; `np.asarray` on
  the oldest in-flight array is the only blocking point.
- Results come back strictly in submission order (a vocoder stream is
  order-sensitive); `stream()` yields them as they complete so a caller can
  overlap its own post-processing (file writes, playback) with device work.
"""
from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, List, Sequence

import numpy as np


class PipelinedSynthesizer:
    def __init__(self, model, params, length_buckets=(128, 256, 512, 1024, 2048),
                 depth: int = 2):
        if depth < 1:
            raise ValueError(f"pipeline depth must be >= 1, got {depth}")
        self.model = model
        self.params = params
        self.length_buckets = tuple(sorted(length_buckets))
        self.depth = depth
        self._jitted = {}

    # -- shared shape conventions (MELInverter.synth_from_mel) -------------
    def _bucket_len(self, T: int) -> int:
        for b in self.length_buckets:
            if T <= b:
                return b
        return T

    def _fn(self, T_pad: int):
        import jax

        if T_pad not in self._jitted:
            model = self.model
            hop = model.spect_hop_size

            def fn(params, mell):
                return model.infer(params, mell, synth_length=mell.shape[1] * hop)

            self._jitted[T_pad] = jax.jit(fn)
        return self._jitted[T_pad]

    def warm(self, buckets=None) -> None:
        import jax.numpy as jnp

        n_mel = self.model.mel_channels
        for b in buckets or self.length_buckets:
            y = self._fn(b)(self.params, jnp.asarray(np.full((1, b, n_mel), -10.0, np.float32)))
            np.asarray(y[0, :4])

    # -- pipeline -----------------------------------------------------------
    def _dispatch(self, mel: np.ndarray):
        """Enqueue one utterance; returns (device_array, true_T).  Non-blocking
        beyond the host→device feed."""
        import jax.numpy as jnp

        mel = np.asarray(mel, dtype=np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.ndim != 3 or mel.shape[0] != 1:
            raise ValueError(f"expected one utterance (T, C) or (1, T, C), got {mel.shape}")
        T = mel.shape[1]
        T_pad = self._bucket_len(T)
        if T_pad != T:
            mel = np.concatenate([mel, np.repeat(mel[:, -1:], T_pad - T, axis=1)], axis=1)
        return self._fn(T_pad)(self.params, jnp.asarray(mel)), T

    def _collect(self, y, T: int) -> np.ndarray:
        hop = self.model.spect_hop_size
        return np.asarray(y)[0, : T * hop]

    def stream(self, mells: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Yield waveforms in submission order, keeping up to `depth`
        utterances in flight on the device."""
        inflight: deque = deque()
        for mel in mells:
            inflight.append(self._dispatch(mel))
            if len(inflight) >= self.depth:
                yield self._collect(*inflight.popleft())
        while inflight:
            yield self._collect(*inflight.popleft())

    def map(self, mells: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Pipelined equivalent of [synth(m) for m in mells]."""
        return list(self.stream(mells))
