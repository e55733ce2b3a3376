"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware (the
standard JAX trick); the real-chip path is exercised by bench.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

TESTDATA = pathlib.Path("/root/reference/testdata")
REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def golden_zkey_bytes():
    return (TESTDATA / "circuit_final.zkey").read_bytes()


@pytest.fixture(scope="session")
def golden_wtns_bytes():
    return (TESTDATA / "witness.wtns").read_bytes()


@pytest.fixture(scope="session")
def golden_vk_json():
    import json
    return json.loads((TESTDATA / "verification_key.json").read_text())
