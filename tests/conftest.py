"""Test configuration: force the XLA CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the reference
never tests multi-device at all — SURVEY.md §4).

Note: this image pre-registers a TPU platform through sitecustomize before
conftest runs, so plain env vars are not enough — we must flip the platform
via jax.config after import (safe: no backend has been initialized yet)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# rbg PRNG: XLA:CPU compiles threefry's unrolled rotate/xor chains
# pathologically slowly (3x+ on net-init modules, measured in the multichip
# dryrun work).  Tests never depend on specific key-stream values — torch
# goldens convert explicit weights, statistical asserts only need
# independent draws — so the cheaper-to-compile generator is right here.
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gan2shape_tpu.utils.cache import enable_compilation_cache  # noqa: E402

# persistent XLA compile cache (CPU-feature-fingerprint keyed): cold suite
# cost is XLA:CPU compiles; reruns on the same host skip them entirely
enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
