"""Platform selection helper.

Some TPU runtime images register their PJRT plugin at interpreter start and
force `jax_platforms` to the plugin (overriding the JAX_PLATFORMS env var set
by the user).  `apply_platform_override()` re-applies an explicit user choice
from the MBEXWN_PLATFORM env var after import, so `MBEXWN_PLATFORM=cpu
python bin/resynth_mel.py ...` reliably runs on CPU.
"""
from __future__ import annotations

import os


def apply_platform_override():
    plat = os.environ.get("MBEXWN_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
