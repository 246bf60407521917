"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mbexwn_vocoder_tpu.ops.oscillator import grid_crossfade, stable_cumsum_and_wrap, wavetable_lookup
from mbexwn_vocoder_tpu.ops.pallas_oscillator import oscillator_fused


def test_fused_oscillator_matches_xla_path():
    rng = np.random.RandomState(0)
    wt = rng.randn(513, 13).astype(np.float32)
    freq = (80 + 400 * np.abs(np.sin(np.linspace(0, 9, 2 * 5000)))).astype(np.float32).reshape(2, 5000)
    phase = np.asarray(stable_cumsum_and_wrap(jnp.asarray(freq) / 12000.0))

    nominal, gf = 46.875, 1.25
    min_tr, max_tr = 1.0, float(1.25**12)

    ref = grid_crossfade(
        wavetable_lookup(jnp.asarray(phase), jnp.asarray(wt)),
        jnp.asarray(freq), nominal, gf, min_tr, max_tr,
    )
    fused = oscillator_fused(jnp.asarray(phase), jnp.asarray(freq), jnp.asarray(wt),
                             nominal, gf, min_tr, max_tr, tile=1024, interpret=True)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_oscillator_ragged_tail():
    """Flattened length not divisible by the block: padding is masked out."""
    rng = np.random.RandomState(1)
    wt = rng.randn(65, 4).astype(np.float32)
    freq = np.full((1, 777), 100.0, np.float32)
    phase = np.asarray(stable_cumsum_and_wrap(jnp.asarray(freq) / 12000.0))
    ref = grid_crossfade(wavetable_lookup(jnp.asarray(phase), jnp.asarray(wt)),
                         jnp.asarray(freq), 50.0, 1.25, 1.0, 4.0)
    fused = oscillator_fused(jnp.asarray(phase), jnp.asarray(freq), jnp.asarray(wt),
                             50.0, 1.25, 1.0, 4.0, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)
