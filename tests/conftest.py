"""Test configuration: run the suite on a virtual 8-device CPU mesh so it
exercises multi-device sharding paths without TPU hardware (and with
deterministic fp32 numerics — the TPU's default bf16 matmul precision is a
benchmark-time choice, not a test-time one)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon sitecustomize (TPU tunnel) overrides jax_platforms via config at
# interpreter start; env vars alone don't win. Force CPU at config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, (
    "tests expect an 8-device virtual CPU mesh; got "
    f"{jax.devices()}")
