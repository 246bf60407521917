"""Parameter-tree persistence: flat .npz of slash-joined tree paths.

This is the framework's native light-weight checkpoint format for inference
models (the reference's equivalent artefact is the Keras `weights.tf` bundle,
mel_inverter.py:206-210).  Orbax handles training checkpoints; this format is
dependency-free and memory-maps fast for serving.
"""
from __future__ import annotations

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


# sidecar key recording that the file was downcast for distribution; kept out
# of the parameter tree namespace (parameter names never start with "__")
_DIST_DTYPE_KEY = "__distribution_dtype__"


def save_params(path: str, params, dtype=None, compressed: bool = False) -> None:
    """Write a parameter tree as a flat .npz.

    `dtype` (e.g. np.float16) downcasts floating arrays for distribution —
    half the file size; the downcast is recorded in an explicit sidecar key
    so `load_params` can upcast exactly those files back to float32 (compute
    always runs from fp32 master params; the shipped bf16 compute modes cast
    separately at call time).  A tree that legitimately contains fp16 leaves
    and is saved *without* `dtype` round-trips unchanged.  Integer/bool
    leaves are kept as-is.
    """
    flat = _flatten(params)
    if dtype is not None:
        limit = float(np.finfo(dtype).max)

        def _cast(v):
            if not np.issubdtype(v.dtype, np.floating):
                return v
            if v.size and float(np.max(np.abs(v))) >= limit:
                return v  # out of target-dtype range: keep master precision
            return v.astype(dtype)

        flat = {k: _cast(v) for k, v in flat.items()}
        flat[_DIST_DTYPE_KEY] = np.asarray(np.dtype(dtype).name)
    (np.savez_compressed if compressed else np.savez)(path, **flat)


def load_params(path: str):
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    dist_dtype = flat.pop(_DIST_DTYPE_KEY, None)
    if dist_dtype is not None:
        # distribution-compressed: restore master fp32 for the arrays that
        # were downcast (out-of-range arrays were kept at master precision)
        dd = np.dtype(str(dist_dtype))
        flat = {k: (v.astype(np.float32) if v.dtype == dd else v) for k, v in flat.items()}
    tree = _unflatten(flat)
    return _restore_scalars(tree)


def _restore_scalars(tree):
    """npz stores python bools as 0-d arrays; restore the _equalized_lr flag."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k == "_equalized_lr":
                out[k] = bool(v)
            else:
                out[k] = _restore_scalars(v)
        return out
    return tree
