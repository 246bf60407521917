"""Device-mesh helpers.

The vocoder's parallel axes (SURVEY §2a):
- 'data': utterance batches (the throughput axis; weights replicated)
- 'model': reserved for sharding the WaveNet channel dim if a configuration
  ever exceeds one chip's HBM (the shipped 320-340ch models do not)

Collectives ride ICI within a slice; `jax.distributed.initialize` extends the
same code path across hosts (DCN) -- nothing here is host-count specific.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
