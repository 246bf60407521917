"""Multi-host initialisation and launch helpers.

Standard JAX multi-host pattern (SURVEY §5 "distributed communication
backend"): every host calls `initialize()` with the same coordinator, then
all device-level code in this package (mesh.py, batch.py, trainer DP) works
unchanged -- `jax.devices()` spans the slice, collectives ride ICI within a
slice and DCN across hosts.  On a single host this is a no-op.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID
    (also honors auto-detection on Cloud TPU pods where jax can infer all
    three).  Returns True if distributed mode was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        try:
            # Cloud TPU pods: jax can auto-detect the topology
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info():
    import jax

    return {"process_index": jax.process_index(), "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()), "global_devices": len(jax.devices())}
