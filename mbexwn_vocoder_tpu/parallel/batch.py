"""Data-parallel batched resynthesis over a device mesh.

Utterance batches shard along the 'data' axis; params replicate.  The whole
synthesis remains one jitted program per (batch, length-bucket) shape -- XLA
partitions it across the mesh (no collectives needed at inference: the model
is replicated and the batch is embarrassingly parallel, so throughput scales
linearly with chips; BASELINE.md weak-scaling target).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class BatchSynthesizer:
    def __init__(self, model, params, mesh: Optional[Mesh] = None, length_buckets=(128, 256, 512, 1024, 2048)):
        self.model = model
        self.mesh = mesh
        self.length_buckets = tuple(sorted(length_buckets))
        if mesh is not None:
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
            self.n_shards = mesh.shape["data"]
        else:
            self.params = params
            self.n_shards = 1
        self._jitted = {}

    def _fn(self, T_pad: int, B_pad: int):
        key = (T_pad, B_pad)
        if key not in self._jitted:
            model = self.model
            hop = model.spect_hop_size

            def fn(params, mell):
                if self.mesh is not None:
                    mell = jax.lax.with_sharding_constraint(mell, NamedSharding(self.mesh, P("data")))
                return model.infer(params, mell, synth_length=mell.shape[1] * hop)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _bucket(self, T: int) -> int:
        for b in self.length_buckets:
            if T <= b:
                return b
        return T

    def synth_batch(self, mells: Sequence[np.ndarray]) -> List[np.ndarray]:
        """mells: list of (T_i, C) log-mels -> list of (T_i*hop,) waveforms.

        Utterances are grouped by length bucket, padded to (B_pad, T_pad) with
        B_pad a multiple of the mesh data-axis size, and trimmed after.
        """
        hop = self.model.spect_hop_size
        order = sorted(range(len(mells)), key=lambda i: mells[i].shape[0])
        results: List[Optional[np.ndarray]] = [None] * len(mells)

        # group indices by bucket
        groups: Dict[int, List[int]] = {}
        for i in order:
            groups.setdefault(self._bucket(mells[i].shape[0]), []).append(i)

        for T_pad, idxs in groups.items():
            for start in range(0, len(idxs), max(self.n_shards, 1) * 8):
                chunk = idxs[start : start + max(self.n_shards, 1) * 8]
                B = len(chunk)
                B_pad = -(-B // self.n_shards) * self.n_shards
                batch = np.zeros((B_pad, T_pad, mells[chunk[0]].shape[-1]), dtype=np.float32)
                for j, i in enumerate(chunk):
                    m = mells[i]
                    batch[j, : m.shape[0]] = m
                    if m.shape[0] < T_pad:  # edge-pad with the last frame
                        batch[j, m.shape[0] :] = m[-1]
                y = np.asarray(self._fn(T_pad, B_pad)(self.params, jnp.asarray(batch)))
                for j, i in enumerate(chunk):
                    results[i] = y[j, : mells[i].shape[0] * hop]
        return results
