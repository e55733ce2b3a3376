"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware (the
standard JAX trick); the real-chip path is exercised by bench.py.

NOTE: this environment injects a remote-TPU PJRT plugin ("axon") into every
python process via sitecustomize and pins JAX_PLATFORMS=axon, so the env-var
route to the CPU backend is ineffective; `jax.config.update` after import
wins.  Compiles against the remote TPU take ~1 min each over the relay --
tests must stay on CPU.
"""
import os
import pathlib
import sys

# XLA:CPU's LLVM JIT eats several mmaps per compiled executable; heavy
# sessions blow the 65530 default (-> 'LLVM compilation error: Cannot
# allocate memory' + segfault, the round-2 full-suite killer).  Raise it
# when we can (root); per-file pytest processes bound it otherwise.
from ultragroth_tpu.runtime import ensure_map_count

ensure_map_count()

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

TESTDATA = pathlib.Path("/root/reference/testdata")
REPO = pathlib.Path(__file__).resolve().parent.parent

# machine-scoped: cross-box AOT cache entries error/SIGILL on load
# (runtime.host_fingerprint docstring; killed the r4/r5 interpret children)
from ultragroth_tpu.runtime import cpu_cache_dir

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Serialize only expensive compiles: XLA-CPU executable serialization
# aborts sporadically deep into many-compile pytest processes (heap
# corruption tripped inside executable.serialize(); observed 3x on
# 2026-08-17, each time tens of minutes / hundreds of cache writes in).
# Cheap compiles recompile faster than they (de)serialize anyway.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


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
