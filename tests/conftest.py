"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without a TPU pod (the analog of the reference testing everything on host CI;
multi-device behavior is validated on a simulated mesh — SURVEY.md §4)."""

import os
import sys

# Must be set before jax is imported anywhere. NOTE: this sandbox's
# sitecustomize imports jax at interpreter startup and force-sets
# jax_platforms to "axon,cpu", so the env var alone is not enough — we also
# override via jax.config.update below, before any backend is used.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("NAM_TPU_TESTS_ON_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

EXAMPLE_MODELS = "/root/reference/example_models"
EXAMPLE_AUDIO = "/root/reference/example_audio/input.wav"


@pytest.fixture(scope="session")
def example_models_dir():
    return EXAMPLE_MODELS


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running oracle tests")
