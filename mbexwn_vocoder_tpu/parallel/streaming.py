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


def _mod1_sum(x: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Stable sum mod 1 over axis 1 of a (B, T) array of phase increments.

    Summing tens of thousands of fp32 increments loses the fractional part
    once the total exceeds ~2^13 cycles; block-wise partial sums taken mod 1
    before the final reduction keep every intermediate small -- the same
    range-bounding idea as the reference's chunked cumsum
    (tf_wavetable.py:457-492), applied to a single total."""
    B, T = x.shape
    pad = (-T) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    partial = jnp.sum(x.reshape(B, -1, block), axis=2) % 1.0
    return jnp.sum(partial, axis=1) % 1.0


class StreamingSynthesizer:
    def __init__(self, model, params, chunk_frames: int = 256, halo_frames: int = 40, use_jit: bool = True,
                 mesh=None, halo_right: Optional[int] = None):
        """halo_right: lookahead halo in mel frames (defaults to halo_frames).

        With a force_causal model the convolutional receptive field only
        extends into the past, so halo_right can drop to the tiny lookahead
        the conditioning interpolation needs (1-2 frames) -- the algorithmic
        latency of live synthesis becomes (chunk_frames + halo_right) mel
        frames instead of (chunk_frames + halo_frames)."""
        self.model = model
        self.params = params
        self.chunk_frames = chunk_frames
        self.halo_frames = halo_frames
        self.halo_right = halo_frames if halo_right is None else halo_right
        self.use_jit = use_jit
        # sequence parallelism: with a mesh, the chunk batch of synth_batched
        # shards over the 'data' axis (chunks are independent given their
        # phase offsets, so SP == DP over the chunk dimension)
        self.mesh = mesh
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

    def _f0_fn(self, span: int):
        key = ("f0", span)
        if key not in self._jitted:
            model = self.model

            def fn(params, mel_span):
                return model.block.generate_f0(params, mel_span)

            self._jitted[key] = jax.jit(fn) if self.use_jit else fn
        return self._jitted[key]

    def _chunk_batch_fn(self, span: int, left: int, inner: int):
        key = ("batched", span, left, inner)
        if key not in self._jitted:
            model = self.model
            hop = self.hop
            mesh = self.mesh

            def fn(params, mel_spans, offsets):
                # shard the chunk batch over 'data' (uniform middle group;
                # edge groups smaller than the axis stay replicated -- they
                # would force an inefficient full rematerialization reshard)
                if mesh is not None and mel_spans.shape[0] % mesh.shape["data"] == 0:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    mel_spans = jax.lax.with_sharding_constraint(
                        mel_spans, NamedSharding(mesh, P("data"))
                    )
                y = model.infer(params, mel_spans, synth_length=mel_spans.shape[1] * hop,
                                phase_offset=offsets)
                a0 = left * hop
                return y[:, a0 : a0 + inner * hop]

            self._jitted[key] = jax.jit(fn) if self.use_jit else fn
        return self._jitted[key]

    def _scan_fn(self, n_chunks: int, B: int):
        """One jitted program running the WHOLE chunk loop on device: a
        lax.scan over chunk index with the oscillator phase (mod 1) as the
        scan carry -- the reference's chunked-cumsum row carry
        (tf_wavetable.py:477-483) lifted to chunk level.  Removes the
        per-chunk host dispatch (the relay RTT that dominates the sequential
        path) entirely; audio for chunk k is available after k body steps,
        so device-side latency stays bounded by one chunk."""
        key = ("scan", n_chunks, B)
        if key not in self._jitted:
            model = self.model
            c, h, hr = self.chunk_frames, self.halo_frames, self.halo_right
            stp, hop = self.stp, self.hop
            span = c + h + hr
            pulse_rate = self.pulse_rate

            def fn(params, mell, mel_halo):
                C = mel_halo.shape[2]
                # one cheap full-length F0 pass fixes every chunk's start
                # phase from the SAME contour the one-shot program integrates
                # (a chunk-local carry would bake the edge chunks'
                # halo-perturbed F0 into all later chunks as a permanent
                # phase shift).  Block sums mod 1 -> exclusive cumsum mod 1
                # is the reference's offsets row (tf_wavetable.py:477-483)
                # at chunk granularity.
                f0_full = model.block.generate_f0(params, mell)
                f0_full = jnp.pad(
                    f0_full, ((0, 0), (0, n_chunks * c * stp - f0_full.shape[1])), mode="edge"
                )
                vel = f0_full / pulse_rate
                blocks = vel.reshape(B, n_chunks, c, stp)  # per-frame inner sums stay < 1 cycle-ish
                inc = jnp.sum(jnp.sum(blocks, axis=3) % 1.0, axis=2) % 1.0  # (B, n_chunks)
                starts = jnp.pad(jnp.cumsum(inc, axis=1) % 1.0, ((0, 0), (1, 0)))[:, :-1]
                f0_haloed = jnp.pad(f0_full, ((0, 0), (h * stp, hr * stp)), mode="edge")

                def body(_, xs):
                    i, start = xs
                    mel_span = jax.lax.dynamic_slice(mel_halo, (0, i * c, 0), (B, span, C))
                    # every chunk synthesizes against the GLOBAL F0 contour
                    # (sliced), so its phase integral is the one-shot phase
                    # exactly; a chunk-locally predicted F0 would drift at the
                    # halo boundary and carry that drift through the chunk
                    f0_span = jax.lax.dynamic_slice(f0_haloed, (0, i * c * stp), (B, span * stp))
                    left_inc = _mod1_sum(f0_span[:, : h * stp] / pulse_rate)
                    offset = jnp.mod(start - left_inc, 1.0)
                    y = model.infer(
                        params, mel_span, synth_length=span * hop, F0=f0_span, phase_offset=offset
                    )
                    return (), y[:, h * hop : (h + c) * hop]

                _, ys = jax.lax.scan(body, (), (jnp.arange(n_chunks), jnp.transpose(starts)))
                return jnp.transpose(ys, (1, 0, 2)).reshape(B, n_chunks * c * hop)

            self._jitted[key] = jax.jit(fn) if self.use_jit else fn
        return self._jitted[key]

    def synth_scan(self, mell: np.ndarray) -> np.ndarray:
        """(B, T, C) log-mel -> (B, T*hop) waveform via the on-device scan.

        All chunks use one uniform [halo_frames | chunk | halo_right] span;
        the mel is edge-replicated into the outer halos and to a whole number
        of chunks,
        so the first/last `halo_frames` of output see replicated context
        where the one-shot program sees the signal boundary (bounded,
        receptive-field-local difference; interior chunks match the one-shot
        output -- property-tested in tests/test_parallel.py).  Works for any
        batch size."""
        B, T, C = mell.shape
        c, h, hr = self.chunk_frames, self.halo_frames, self.halo_right
        if T <= c + h:
            y = self.model.infer(self.params, jnp.asarray(mell), synth_length=T * self.hop)
            return np.asarray(y)
        n_chunks = -(-T // c)
        mel_halo = np.pad(mell, ((0, 0), (h, n_chunks * c - T + hr), (0, 0)), mode="edge")
        y = self._scan_fn(n_chunks, B)(self.params, jnp.asarray(mell), jnp.asarray(mel_halo))
        return np.asarray(y)[:, : T * self.hop]

    def synth_batched(self, mell: np.ndarray) -> np.ndarray:
        """Sequence-parallel long-form synthesis: every chunk evaluated in one
        BATCHED call instead of sequentially.

        Chunks are independent given their absolute phase at the left edge, so
        a cheap F0-only pass computes all carries up front (float64 mod-1 on
        the host), and the uniform middle chunks synthesize as a single batch
        -- the long-form latency becomes ~the batched-throughput cost instead
        of n_chunks sequential dispatches.  On a multi-chip mesh the same
        batch shards over 'data' (true sequence parallelism).

        Supports any batch size B; chunk rows of every utterance are stacked
        into one device batch of B*n_chunks items.
        """
        B, T, C = mell.shape
        c, h, hr = self.chunk_frames, self.halo_frames, self.halo_right
        if T <= c + h:
            y = self.model.infer(self.params, jnp.asarray(mell), synth_length=T * self.hop)
            return np.asarray(y)

        # chunk geometry
        bounds = []
        t0 = 0
        while t0 < T:
            t1 = min(t0 + c, T)
            lo, hi = max(0, t0 - h), min(T, t1 + hr)
            bounds.append((t0, t1, lo, hi))
            t0 = t1

        # pass 1: F0 over each span (per distinct span shape).  Two pieces per
        # chunk: the interior contour (feeds the global carry accumulation)
        # and the span's OWN left-halo integral -- the oscillator inside the
        # chunk integrates the span's own F0 prediction over the halo, so the
        # offset must cancel exactly that quantity (not the global contour,
        # which differs slightly at span edges).
        f0_interior = [None] * len(bounds)
        f0_left_inc = [None] * len(bounds)
        span_groups: Dict[int, list] = {}
        for idx, (t0, t1, lo, hi) in enumerate(bounds):
            span_groups.setdefault(hi - lo, []).append(idx)
        for span, idxs in span_groups.items():
            # stack as (n_i, B, span, C) -> one (n_i*B, span, C) device batch
            mel_spans = np.stack([mell[:, bounds[i][2] : bounds[i][3]] for i in idxs], axis=0)
            f0s = np.asarray(
                self._f0_fn(span)(self.params, jnp.asarray(mel_spans.reshape(-1, span, C)))
            ).reshape(len(idxs), B, -1)
            for row, i in enumerate(idxs):
                t0, t1, lo, hi = bounds[i]
                f0 = f0s[row]  # (B, span*stp)
                f0_interior[i] = f0[:, (t0 - lo) * self.stp : (t0 - lo + (t1 - t0)) * self.stp]
                f0_left_inc[i] = (
                    np.sum(f0[:, : (t0 - lo) * self.stp].astype(np.float64), axis=1) / self.pulse_rate
                )
        carries = [np.zeros((B,), dtype=np.float64)]
        for f0i in f0_interior[:-1]:
            carries.append(
                np.mod(carries[-1] + np.sum(f0i.astype(np.float64), axis=1) / self.pulse_rate, 1.0)
            )
        offsets = [np.mod(c - inc, 1.0).astype(np.float32) for c, inc in zip(carries, f0_left_inc)]

        # pass 2: group chunks by (span, left, inner) and run batched
        out = np.empty((B, T * self.hop), dtype=np.float32)
        groups: Dict[Tuple[int, int, int], list] = {}
        for idx, (t0, t1, lo, hi) in enumerate(bounds):
            groups.setdefault((hi - lo, t0 - lo, t1 - t0), []).append(idx)
        for (span, left, inner), idxs in groups.items():
            mel_spans = np.stack([mell[:, bounds[i][2] : bounds[i][3]] for i in idxs], axis=0)
            offs = np.stack([offsets[i] for i in idxs], axis=0)  # (n_i, B)
            ys = np.asarray(
                self._chunk_batch_fn(span, left, inner)(
                    self.params, jnp.asarray(mel_spans.reshape(-1, span, C)),
                    jnp.asarray(offs.reshape(-1)),
                )
            ).reshape(len(idxs), B, inner * self.hop)
            for row, i in enumerate(idxs):
                t0, t1 = bounds[i][0], bounds[i][1]
                out[:, t0 * self.hop : t1 * self.hop] = ys[row]
        return out

    def synth(self, mell: np.ndarray) -> np.ndarray:
        """(B, T, C) log-mel -> (B, T*hop) waveform."""
        B, T, C = mell.shape
        c, h, hr = self.chunk_frames, self.halo_frames, self.halo_right
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
            hi = min(T, t1 + hr)
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

    def warm(self, batch_size: int = 1) -> None:
        """Precompile every chunk program stream()/synth() will hit in the
        left-halo ramp-up (left context grows min(h, k*c) until it saturates
        at h) so live synthesis pays no XLA compile at first audio."""
        import jax.numpy as jnp

        c, h, hr = self.chunk_frames, self.halo_frames, self.halo_right
        C = self.model.mel_channels
        for left in sorted({min(h, k * c) for k in range(-(-h // c) + 1)}):
            fn = self._chunk_fn(left + c + hr, left, c)
            a, _ = fn(self.params, jnp.full((batch_size, left + c + hr, C), -10.0, jnp.float32),
                      jnp.zeros((batch_size,), jnp.float32))
            np.asarray(a[0, :4])

    def stream(self, frames_iter):
        """Live synthesis: consume an iterator of (B, n, C) mel-frame slabs,
        yield (B, chunk_frames*hop) audio slabs as soon as they are computable.

        A chunk's audio is emitted once `halo_right` frames beyond its end
        have arrived (plus the retained `halo_frames` of past context), so the
        end-to-end algorithmic latency is (chunk_frames + halo_right) mel
        frames.  With a force_causal model and halo_right<=2 that is
        (chunk_frames+2)*hop samples -- e.g. 12.5 ms per frame at the 24 kHz /
        hop 300 production rate.  One chunk program shape is compiled for the
        steady state (plus boundary shapes for the first/last chunks).  After
        the iterator is exhausted the tail is flushed with the lookahead
        truncated at the signal end -- the same boundary the one-shot program
        sees, so stream() output == synth() output chunk for chunk.
        """
        c, h, hr = self.chunk_frames, self.halo_frames, self.halo_right
        buf = None  # received-but-not-discarded frames; buf[:, 0] is frame buf_start
        buf_start = 0
        t0 = 0  # next chunk starts at this absolute frame
        carry = None

        def _emit(mel_span, left, inner, carry):
            fn = self._chunk_fn(mel_span.shape[1], left, inner)
            audio, f0_interior = fn(self.params, jnp.asarray(mel_span),
                                    jnp.asarray(carry, dtype=jnp.float32))
            new_carry = np.mod(
                carry + np.sum(np.asarray(f0_interior, dtype=np.float64), axis=1) / self.pulse_rate,
                1.0,
            )
            return np.asarray(audio), new_carry

        for slab in frames_iter:
            slab = np.asarray(slab)
            if buf is None:
                buf = slab
                carry = np.zeros((slab.shape[0],), dtype=np.float64)
            else:
                buf = np.concatenate([buf, slab], axis=1)
            while buf_start + buf.shape[1] >= t0 + c + hr:
                lo = max(0, t0 - h)
                span = buf[:, lo - buf_start : t0 + c + hr - buf_start]
                audio, carry = _emit(span, t0 - lo, c, carry)
                yield audio
                t0 += c
                new_lo = max(0, t0 - h)
                buf = buf[:, new_lo - buf_start :]
                buf_start = new_lo
        if buf is None:
            return
        # flush the tail; lookahead truncates at the signal end -- exactly the
        # boundary the one-shot program sees (synth's last-chunk convention)
        total = buf_start + buf.shape[1]
        while t0 < total:
            inner = min(c, total - t0)
            lo = max(0, t0 - h)
            hi = min(total, t0 + inner + hr)
            audio, carry = _emit(buf[:, lo - buf_start : hi - buf_start], t0 - lo, inner, carry)
            yield audio
            t0 += inner
