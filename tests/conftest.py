"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import so
multi-chip sharding paths are exercised without TPU hardware (the reference's
multi-node proxy role is played by sqllogictest + RepartitionExec unit tests;
ours is the host-local mesh simulator, SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS=cpu when XLA_FLAGS is set;
# forcing via config (before first backend touch) wins reliably.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
