"""Multi-chip execution: mesh-sharded MSM and NTT.

The reference is single-process shared-memory only (OpenMP + ThreadPool,
SURVEY.md section 2.12); this package is the TPU-native scaling dimension:
`jax.sharding.Mesh` + `shard_map`, with XLA collectives over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | str | None = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first `n_devices` local devices.

    n_devices None/0/"all" -> every visible device, rounded DOWN to a power
    of two (the sharded MSM/NTT paths shard power-of-two extents)."""
    devs = jax.devices()
    if n_devices in (None, 0, "all"):
        n = 1 << (len(devs).bit_length() - 1)
    else:
        n = int(n_devices)
    if n < 1 or n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    if n & (n - 1):
        raise ValueError(f"device count must be a power of two, got {n}")
    return Mesh(np.array(devs[:n]), (axis,))
