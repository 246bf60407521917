"""On-device PQMF analysis / synthesis.

reference semantics: MBExWN_NVoc/vocoder/model/tf_preprocess.py:188-226.

TPU notes: analysis is a single strided conv (the reference's separate
identity "updown" conv is algebraically a stride-S slice and is folded into
the conv stride here); synthesis zero-stuffs via reshape (no transposed-conv
scatter) then runs one dense conv.  Both lower to MXU matmuls.
"""
from __future__ import annotations

import jax.numpy as jnp

from .conv import conv1d


def pqmf_analysis(x: jnp.ndarray, analysis_filter: jnp.ndarray, subbands: int, taps: int) -> jnp.ndarray:
    """(B, T, 1) -> (B, T//subbands, subbands).

    Matches: pad taps//2 both sides, conv VALID with the analysis bank, then
    decimate by `subbands` (tf_preprocess.py:188-202).
    """
    x = jnp.pad(x, ((0, 0), (taps // 2, taps // 2), (0, 0)))
    return conv1d(x, analysis_filter, stride=subbands, padding="VALID")


def pqmf_synthesis(x: jnp.ndarray, synthesis_filter: jnp.ndarray, subbands: int, taps: int,
                   used_subbands=None) -> jnp.ndarray:
    """(B, T, subbands) -> (B, T*subbands, 1).

    Matches: upsample each band by zero insertion x subbands (scaled by
    subbands), pad taps//2, conv with the synthesis bank summing bands
    (tf_preprocess.py:204-226).
    """
    used = used_subbands or subbands
    B, T, C = x.shape
    x = x[:, :, :used]
    # zero-stuff: (B, T, used) -> (B, T*subbands, used) with samples at
    # k*subbands (pure concat+reshape; no scatter)
    up = jnp.concatenate(
        [(x * subbands)[:, :, None, :], jnp.zeros((B, T, subbands - 1, used), dtype=x.dtype)], axis=2
    )
    up = up.reshape(B, T * subbands, used)
    up = jnp.pad(up, ((0, 0), (taps // 2, taps // 2), (0, 0)))
    return conv1d(up, synthesis_filter, stride=1, padding="VALID")
