"""Layout decision session: where do the MSM step's ~3ms go, and which
gather layout should msm v3 use?  Measures the exact current step chain
and the plane-major alternative."""
from __future__ import annotations

import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from experiments.measure_r2 import timed  # noqa: E402

rng = np.random.default_rng(2)
N = 1 << 18
B = 8192


def mk_points(width):
    qx = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    qy = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    return qx, qy


def m_step_rowmajor():
    """The CURRENT msm step: gather row-major packed + transpose + madd."""
    from ultragroth_tpu.ops import kernels
    from ultragroth_tpu.ops.curve import g1_ops
    madd = kernels.curve_madd_valid("g1")
    ops = g1_ops()
    packed = jnp.asarray(rng.integers(0, 1 << 16, (N, 33), np.uint32))
    idx0 = jnp.asarray(rng.integers(0, N, B, np.int64).astype(np.int32))
    acc0 = ops.inf_xyzz((B,))

    def body(st, packed):
        idx, acc = st
        rows = packed[idx]
        rt = rows.T
        gx, gy = rt[0:16], rt[16:32]
        ginf = rt[32] != 0
        acc = madd(acc, gx, gy, ginf)
        idx = (idx + 1) & (N - 1)
        return idx, acc

    timed("step_rowmajor[gather+T+madd B=8192]", body, (idx0, acc0), packed,
          per=B)


def m_step_planemajor():
    """Alternative: plane-major [33, N] table, gather along axis 1."""
    from ultragroth_tpu.ops import kernels
    from ultragroth_tpu.ops.curve import g1_ops
    madd = kernels.curve_madd_valid("g1")
    ops = g1_ops()
    planes = jnp.asarray(rng.integers(0, 1 << 16, (33, N), np.uint32))
    idx0 = jnp.asarray(rng.integers(0, N, B, np.int64).astype(np.int32))
    acc0 = ops.inf_xyzz((B,))

    def body(st, planes):
        idx, acc = st
        cols = planes[:, idx]
        gx, gy = cols[0:16], cols[16:32]
        ginf = cols[32] != 0
        acc = madd(acc, gx, gy, ginf)
        idx = (idx + 1) & (N - 1)
        return idx, acc

    timed("step_planemajor[gatherT+madd B=8192]", body, (idx0, acc0), planes,
          per=B)


def m_transpose():
    a = jnp.asarray(rng.integers(0, 1 << 16, (B, 33), np.uint32))

    def body(st, a):
        chk, x = st
        t = (a + chk).T
        return t[0, 0], x

    timed("transpose[8192x33 -> 33x8192]", body,
          (jnp.uint32(0), jnp.uint32(0)), a, per=B)


def m_gather_planes():
    planes = jnp.asarray(rng.integers(0, 1 << 16, (33, N), np.uint32))
    idx0 = jnp.asarray(rng.integers(0, N, B, np.int64).astype(np.int32))

    def body(st, planes):
        idx, chk = st
        cols = planes[:, idx]
        idx = (idx + cols[0].astype(jnp.int32)) & (N - 1)
        return idx, chk + cols[0, 0]

    timed("gather_planes[33xN cols=8192]", body, (idx0, jnp.uint32(0)),
          planes, per=B)


def m_add_where(width):
    from ultragroth_tpu.ops import kernels
    from ultragroth_tpu.ops.curve import g1_ops
    aw = kernels.curve_add_where("g1")
    ops = g1_ops()
    qx, qy = mk_points(width)
    b_pt = (qx, qy, qx, qy)
    ok = jnp.asarray(rng.integers(0, 2, width).astype(bool))
    acc0 = ops.inf_xyzz((width,))

    def body(acc, c):
        b_pt, ok = c
        return aw(acc, b_pt, ok)

    timed(f"g1_add_where[width={width}]", body, acc0, (b_pt, ok), per=width)


def m_argsort_bincount():
    digits = jnp.asarray(rng.integers(0, B, N, np.int64).astype(np.uint32))

    def body(st, _):
        d, chk = st
        order = jnp.argsort(d).astype(jnp.int32)
        counts = jnp.bincount(d.astype(jnp.int32), length=B)
        d = (d + counts[d & (B - 1)].astype(jnp.uint32)) & jnp.uint32(B - 1)
        return d, chk + order[0]

    timed("argsort+bincount[N=2^18 -> 8192]", body,
          (digits, jnp.int32(0)), jnp.uint32(0), per=N)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    m_transpose()
    m_gather_planes()
    m_step_rowmajor()
    m_step_planemajor()
    m_add_where(8192)
    m_argsort_bincount()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
