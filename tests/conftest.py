"""Test harness config: run JAX on an 8-device virtual CPU mesh.

SURVEY.md §4 "Distributed" row: multi-node-without-a-cluster via
--xla_force_host_platform_device_count=8, so DP/sharding tests run
anywhere (and CI never needs the real TPU).

Must set env BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize may force jax_platforms to a TPU
# backend at interpreter start; override it back to CPU before any
# backend is initialized (env var alone is not enough there).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
