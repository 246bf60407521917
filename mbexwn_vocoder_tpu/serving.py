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
                 depth: int = 3, batch: int = 8):
        """depth: in-flight dispatch groups; batch: micro-batching — up to
        `batch` consecutive same-bucket utterances are stacked into ONE device
        batch before dispatch (batch-32 device rate is ~2x batch-1 on this
        model, so concurrent single-utterance traffic gets most of that back
        at a latency cost of waiting for the group to fill; the group also
        flushes on a bucket change and at end of stream).

        Coalescing is ON by default (batch=8): a latency-tolerant caller that
        feeds 8+ concurrent requests gets near the batched device rate out of
        the box.  Single requests and short bursts are unaffected — a group
        smaller than `batch` flushes at end of stream, so one utterance still
        dispatches immediately.  Opt out with batch=1 (strict one-request-per-
        dispatch, the lowest per-request latency under sustained load)."""
        if depth < 1:
            raise ValueError(f"pipeline depth must be >= 1, got {depth}")
        if batch < 1:
            raise ValueError(f"micro-batch size must be >= 1, got {batch}")
        self.model = model
        self.params = params
        self.length_buckets = tuple(sorted(length_buckets))
        self.depth = depth
        self.batch = batch
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
    def _prep(self, mel: np.ndarray):
        """Validate + bucket-pad one utterance -> ((1, T_pad, C), T, T_pad)."""
        mel = np.asarray(mel, dtype=np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.ndim != 3 or mel.shape[0] != 1:
            raise ValueError(f"expected one utterance (T, C) or (1, T, C), got {mel.shape}")
        T = mel.shape[1]
        T_pad = self._bucket_len(T)
        if T_pad != T:
            mel = np.concatenate([mel, np.repeat(mel[:, -1:], T_pad - T, axis=1)], axis=1)
        return mel, T, T_pad

    def _dispatch_group(self, group, T_pad):
        """Enqueue one micro-batch; returns (device_array, [true_T...]).
        Non-blocking beyond the host→device feed."""
        import jax.numpy as jnp

        stack = group[0][0] if len(group) == 1 else np.concatenate([m for m, _ in group], axis=0)
        return self._fn(T_pad)(self.params, jnp.asarray(stack)), [t for _, t in group]

    def _collect(self, y, Ts) -> List[np.ndarray]:
        hop = self.model.spect_hop_size
        y = np.asarray(y)
        return [y[i, : T * hop] for i, T in enumerate(Ts)]

    def stream(self, mells: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Yield waveforms in submission order, keeping up to `depth` dispatch
        groups (of up to `batch` same-bucket utterances each) in flight."""
        inflight: deque = deque()
        pending: List = []
        pend_pad = None
        for mel in mells:
            mel, T, T_pad = self._prep(mel)
            if pending and T_pad != pend_pad:
                inflight.append(self._dispatch_group(pending, pend_pad))
                pending = []
            pending.append((mel, T))
            pend_pad = T_pad
            if len(pending) >= self.batch:
                inflight.append(self._dispatch_group(pending, pend_pad))
                pending = []
            while len(inflight) >= self.depth:
                yield from self._collect(*inflight.popleft())
        if pending:
            inflight.append(self._dispatch_group(pending, pend_pad))
        while inflight:
            yield from self._collect(*inflight.popleft())

    def map(self, mells: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Pipelined equivalent of [synth(m) for m in mells]."""
        return list(self.stream(mells))
