"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4: "multi-chip tests
runnable on a CPU mesh").

Note: this environment's sitecustomize force-registers the TPU ("axon")
backend and pins jax_platforms to it, so the env vars alone aren't enough —
the config must be overridden after importing jax, before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN_DIR
