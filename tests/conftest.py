"""Test configuration: run the suite on a virtual 8-device CPU mesh so it
exercises multi-device sharding paths without TPU hardware (and with
deterministic fp32 numerics — the TPU's default bf16 matmul precision is a
benchmark-time choice, not a test-time one).

Tiering: the torch-oracle parity tiers and the from-scratch convergence
runs take tens of minutes on a 1-core host, so they are marked ``slow``
and SKIPPED by default; ``pytest --runslow`` (or ``-m slow``) runs the
full suite.  The default selection is the fast correctness tier that CI
runs on every change.
"""
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

# Persistent compilation cache: the parity/e2e tests re-jit the same
# programs on every run; caching them cuts suite wall time dramatically on
# this 1-core host (the cache key includes platform, so CPU test entries
# coexist with TPU bench entries).
from buffer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402

# Modules whose tests are the expensive tiers (torch-oracle parity against
# real reference checkpoints, from-scratch convergence, on-disk entry-point
# drives).  Everything in them is `slow`; individual tests elsewhere can
# also opt in with @pytest.mark.slow.
SLOW_MODULES = {
    "test_parity",
    "test_parity_composite",
    "test_training_convergence",
    "test_entrypoints",
}


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run the slow tiers (torch-oracle parity, "
                          "convergence, entry-point drives)")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: expensive tier, needs --runslow")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.split(".")[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
