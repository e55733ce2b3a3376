"""Mesh construction + multi-host process bootstrap.

The reference's only scaling primitive is a single-node ThreadPool
(/root/reference/src/groth16.cpp:70-148, SURVEY.md section 2.12); the TPU
framework scales over a jax.sharding.Mesh instead — intra-slice over ICI,
and across hosts over DCN once `distributed_init()` has formed the
multi-process runtime (SURVEY.md section 5.8).

Axes convention: a ('host', 'chip') mesh whose rows are processes and
columns are each process's local chips.  Every parallel/ entry point takes
`axis` as a string OR a tuple of axis names — data-parallel work shards
over the flattened product (PartitionSpec/psum/all_gather/all_to_all all
accept axis tuples), so the same prover code runs on a flat single-host
mesh and a 2-axis pod slice.

Pod-slice launch (one command per host):

    ULTRAGROTH_COORDINATOR=host0:9876 ULTRAGROTH_NUM_PROCESSES=4 \
    ULTRAGROTH_PROCESS_ID=<i> python -m ultragroth_tpu.cli prove \
        --devices all ...

`distributed_init()` is a no-op when the env vars are absent, so single-
host usage needs nothing.
"""
from __future__ import annotations

import math
import os

import numpy as np

_INITIALIZED = False


def distributed_init() -> bool:
    """jax.distributed.initialize from ULTRAGROTH_COORDINATOR /
    ULTRAGROTH_NUM_PROCESSES / ULTRAGROTH_PROCESS_ID (or the standard JAX
    auto-detect env on supported platforms).  Returns True when a
    multi-process runtime was formed; False (no-op) otherwise."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("ULTRAGROTH_COORDINATOR")
    if not coord:
        return False
    import jax
    try:
        # cross-process collectives on the CPU backend (the multi-host
        # smoke-test path, tests/test_distributed.py) need gloo; the flag
        # is CPU-only and harmless for TPU pod slices
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["ULTRAGROTH_NUM_PROCESSES"]),
        process_id=int(os.environ["ULTRAGROTH_PROCESS_ID"]),
    )
    _INITIALIZED = True
    return True


def axis_size(mesh, axis) -> int:
    """Total device count under `axis` (a name or tuple of names)."""
    if isinstance(axis, (tuple, list)):
        return math.prod(mesh.shape[a] for a in axis)
    return mesh.shape[axis]


def make_host_chip_mesh(n_devices: int | None = None):
    """A ('host', 'chip') mesh over all addressable processes.

    Single-process: one 'host' row over the first n_devices local devices.
    Multi-process (after distributed_init): rows are processes, columns
    each process's local chips — the 'chip' axis rides ICI, 'host' DCN,
    so shardings that keep the heavy exchange on 'chip' stay ICI-bound.
    """
    import jax
    from jax.sharding import Mesh
    n_proc = jax.process_count()
    devs = jax.devices()
    if n_proc == 1:
        if n_devices is not None:
            devs = devs[:n_devices]
        arr = np.array(devs).reshape(1, len(devs))
    else:
        per = len(devs) // n_proc
        order = sorted(devs, key=lambda d: (d.process_index, d.id))
        arr = np.array(order).reshape(n_proc, per)
    return Mesh(arr, ("host", "chip"))


DATA_AXES = ("host", "chip")
