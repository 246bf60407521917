"""AOT model export: serialize a synthesis program to StableHLO.

No reference counterpart (the reference ships TF checkpoints that need the
full Python model code to run, mel_inverter.py:184-239).  Here a model can be
exported as a self-contained serialized XLA program -- parameters baked in as
constants -- and later executed with nothing but jax installed: no model
classes, no config system, no weight files.  This is the TPU-serving analogue
of a TF SavedModel frozen graph.

Artifacts are versioned StableHLO produced by `jax.export`, which guarantees
forward compatibility windows across jax releases.
"""
from __future__ import annotations

import json
import os

from typing import Optional, Sequence

import numpy as np

_MAGIC = b"MBEXWN_AOT1\n"


def export_synthesis(model, params, T_mel: int, batch_size: int = 1,
                     platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize `model.infer` at a fixed (batch, T_mel) shape.

    Parameters are closed over, so they are baked into the artifact as
    constants.  `platforms` defaults to the current backend; pass e.g.
    ("tpu", "cpu") to produce an artifact that runs on either.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    hop = model.preprocess_config["hop_size"]
    mel_channels = model.preprocess_config["mel_channels"]

    def fn(mell):
        return model.infer(params, mell, synth_length=T_mel * hop)

    spec = jax.ShapeDtypeStruct((batch_size, T_mel, mel_channels), jnp.float32)
    exp = jexport.export(jax.jit(fn), platforms=list(platforms) if platforms else None)(spec)
    meta = {
        "batch_size": batch_size,
        "T_mel": T_mel,
        "mel_channels": mel_channels,
        "hop_size": hop,
        "sample_rate": model.preprocess_config["sample_rate"],
        "platforms": list(exp.platforms),
    }
    meta_blob = json.dumps(meta).encode()
    return _MAGIC + len(meta_blob).to_bytes(8, "little") + meta_blob + exp.serialize()


def load_exported(blob):
    """Deserialize an artifact (bytes, or a path to one) ->
    (callable mel->waveform, metadata dict)."""
    from jax import export as jexport

    if isinstance(blob, (str, os.PathLike)):
        with open(blob, "rb") as f:
            blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError("not an MBExWN AOT artifact")
    off = len(_MAGIC)
    n = int.from_bytes(blob[off : off + 8], "little")
    meta = json.loads(blob[off + 8 : off + 8 + n].decode())
    exp = jexport.deserialize(blob[off + 8 + n :])

    def call(mell):
        import jax.numpy as jnp

        return exp.call(jnp.asarray(mell, dtype=jnp.float32))

    return call, meta


def export_model_dir(model_dir_or_id: str, out_path: str, T_mel: int,
                     batch_size: int = 1, platforms: Optional[Sequence[str]] = None,
                     verbose: bool = False) -> dict:
    """Load a model directory / registry id and write the AOT artifact."""
    from ..mel_inverter import MELInverter

    inv = MELInverter(model_dir_or_id, verbose=verbose, length_buckets=(T_mel,))
    blob = export_synthesis(inv.model, inv.params, T_mel=T_mel, batch_size=batch_size,
                            platforms=platforms)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    _, meta = load_exported(blob)
    meta["bytes"] = len(blob)
    return meta


def synth_from_artifact(path: str, mell: np.ndarray) -> np.ndarray:
    """One-call serving helper: load artifact, run, return waveform."""
    with open(path, "rb") as f:
        call, meta = load_exported(f.read())
    return np.asarray(call(mell))
