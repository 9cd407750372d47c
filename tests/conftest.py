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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
