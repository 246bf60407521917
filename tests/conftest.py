"""Test configuration.

- Forces JAX onto a virtual 8-device CPU mesh so sharding/pjit tests run
  without TPU hardware (the standard JAX multi-device test pattern).
- Forces legacy Keras (tf_keras) so the TF2.5-era reference implementation at
  /root/reference can be instantiated as a numerical oracle.
"""
import os
import sys

# The runtime image exports JAX_PLATFORMS=axon (TPU plugin) and a
# sitecustomize imports jax at interpreter start, so plain env setdefault is
# too late/too weak -- force the config through jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
# pin fp32 compute for the test suite: the registry configs ship bfloat16
# inference compute (wn_compute_dtype/subnet_compute_dtype), but oracle
# parity and chunked-vs-one-shot equality are fp32 contracts.  An empty env
# value means "force fp32"; bf16-specific tests monkeypatch these.  Hard
# assignment, not setdefault -- a bfloat16 value inherited from the shell
# (the bench/profile docs tell users to export it) must not leak into the
# suite.
os.environ["MBEXWN_WN_DTYPE"] = ""
os.environ["MBEXWN_SUBNET_DTYPE"] = ""
# same reasoning for the opt-in kernel/fusion paths: the suite tests the
# default layered path, and dedicated tests opt in via monkeypatch
os.environ.pop("MBEXWN_FUSED_TAIL", None)
os.environ.pop("MBEXWN_PALLAS_WN", None)
os.environ.pop("MBEXWN_PALLAS", None)
os.environ.pop("MBEXWN_WN_QUANT", None)
# the suite never touches the TPU, so it must never sit on (or wait for)
# the repo-wide single-tenant TPU lock a live training chain holds
os.environ["MBEXWN_TPU_LOCK"] = "0"
# matmul precision: the suite's oracle tolerances were set under fp32 CPU
# math; keep the default policy (HIGHEST) explicit so a shell override
# cannot flip test numerics
os.environ.pop("MBEXWN_MATMUL_PRECISION", None)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
