"""Round-2 TPU measurement session (one process; results decide the MSM
and NTT redesigns).  Prints one line per measurement, flushed immediately,
so a relay kill mid-run loses nothing already printed.

Timing recipe (memory/axon-tpu-environment): traced-trip-count fori_loop,
host-readback sync, difference two loop lengths to cancel relay overhead.

IMPORTANT relay constraint discovered here: closed-over jnp arrays become
EMBEDDED HLO constants and the remote-compile relay rejects request bodies
over ~64 MB (HTTP 413) — every large operand must be a jit ARGUMENT.
"""
from __future__ import annotations

import time
import sys

import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

N1, N2 = 2, 34  # loop lengths differenced


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:2])


def timed(label, body2, state, consts, per=1.0):
    """body2: (state, consts) -> state, chained n times in-graph.
    consts is a pytree of device arrays passed as jit args (NOT embedded)."""
    t_compile = time.perf_counter()

    @jax.jit
    def run(n, state, consts):
        return lax.fori_loop(0, n, lambda i, s: body2(s, consts), state)

    try:
        out = run(N1, state, consts)
        sync(out)
        dt_c = time.perf_counter() - t_compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(N1, state, consts))
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(run(N2, state, consts))
            dt2 = time.perf_counter() - t0
            per = (dt2 - dt1) / (N2 - N1)
            if per > 0 and (best is None or per < best):
                best = per
        per_iter = best if best is not None else float("nan")
        print(f"{label}: {per_iter*1e3:.3f} ms/iter "
              f"({per_iter/per*1e9:.1f} ns/unit) compile={dt_c:.1f}s",
              flush=True)
        return per_iter
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


rng = np.random.default_rng(1)
LOGN = 18
N = 1 << LOGN


def m_gather(width, nidx):
    table = jnp.asarray(rng.integers(0, 1 << 16, (N, width), np.uint32))
    idx = jnp.asarray(rng.integers(0, N, nidx, np.int64).astype(np.int32))

    def body(st, tbl):
        idx, chk = st
        rows = tbl[idx]
        idx = (idx + rows[:, 0].astype(jnp.int32)) & (N - 1)
        return idx, chk + rows[0, 0]

    timed(f"gather[{N}x{width}u32 rows={nidx}]", body,
          (idx, jnp.uint32(0)), table, per=nidx)


def m_gather_planes(nidx):
    """Gather along axis=1 of [33, N] planes (the MSM's actual layout if we
    skip the packed-rows transpose)."""
    table = jnp.asarray(rng.integers(0, 1 << 16, (33, N), np.uint32))
    idx = jnp.asarray(rng.integers(0, N, nidx, np.int64).astype(np.int32))

    def body(st, tbl):
        idx, chk = st
        cols = tbl[:, idx]
        idx = (idx + cols[0].astype(jnp.int32)) & (N - 1)
        return idx, chk + cols[0, 0]

    timed(f"gather_planes[33x{N} cols={nidx}]", body,
          (idx, jnp.uint32(0)), table, per=nidx)


def m_transpose(nrows):
    """[nrows, 33] -> [33, nrows] u32 transpose (the _unpack_rows step)."""
    a = jnp.asarray(rng.integers(0, 1 << 16, (nrows, 33), np.uint32))

    def body(st, a):
        x, chk = st
        t = (a + chk).T
        return x, t[0, 0]

    timed(f"transpose[{nrows}x33]", body, (jnp.uint32(0), jnp.uint32(0)),
          a, per=nrows)


def m_madd(width):
    from ultragroth_tpu.ops import kernels
    from ultragroth_tpu.ops.curve import g1_ops
    madd = kernels.curve_madd_valid("g1")
    ops = g1_ops()
    qx = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    qy = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    qinf = jnp.zeros((width,), bool)
    acc0 = ops.inf_xyzz((width,))

    def body(acc, c):
        qx, qy, qinf = c
        return madd(acc, qx, qy, qinf)

    timed(f"g1_madd[width={width}]", body, acc0, (qx, qy, qinf), per=width)


def m_mul(width):
    from ultragroth_tpu.ops import kernels
    mul = kernels.fr_mont_mul()
    a = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    timed(f"fr_mont_mul[width={width}]", lambda x, b: mul(x, b), a, b,
          per=width)


def m_sort(n_payload, label, batched=False):
    if batched:
        shape = (32, N // 32)
        dim = 1
    else:
        shape = (N,)
        dim = 0
    key = jnp.asarray(rng.integers(0, 1 << 13, shape, np.uint32))
    payload = [jnp.asarray(rng.integers(0, 1 << 16, shape, np.uint32))
               for _ in range(n_payload)]

    def body(st, _):
        outs = lax.sort(list(st), dimension=dim, num_keys=1)
        k = (outs[0] * jnp.uint32(2654435761) + outs[1]) & jnp.uint32(0x1FFF)
        return (k,) + tuple(outs[1:])

    timed(f"lax.sort[{label} payload={n_payload}]", body,
          (key,) + tuple(payload), jnp.uint32(0), per=N)


def m_stage():
    planes = jnp.asarray(rng.integers(0, 1 << 16, (34, N), np.uint32))

    def body(p, _):
        k = p[0]
        ks = jnp.roll(k, 4096)
        m = k < ks
        return jnp.where(m[None, :], p, jnp.roll(p, 4096, axis=1))

    timed("xla_stage[roll+where 34xN]", body, planes, jnp.uint32(0), per=N)


def m_rawmul(width):
    a = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (16, width), np.uint32))

    def body(x, b):
        for _ in range(16):
            x = x * b + jnp.uint32(1)
        return x

    timed(f"raw_u32_mul[16x chain width={width}]", body, a, b,
          per=width * 16)


def main():
    which = set(sys.argv[1:]) or {"gather", "madd", "mul", "sort", "stage",
                                  "raw", "transpose", "planes"}
    print(f"device={jax.devices()[0]}", flush=True)
    if "gather" in which:
        m_gather(33, 8192)
        m_gather(264, 8192)
        m_gather(33, 65536)
    if "planes" in which:
        m_gather_planes(8192)
    if "transpose" in which:
        m_transpose(8192)
    if "raw" in which:
        m_rawmul(1 << 20)
    if "mul" in which:
        m_mul(1 << 17)
        m_mul(1 << 20)
    if "madd" in which:
        m_madd(8192)
        m_madd(32768)
        m_madd(131072)
    if "sort" in which:
        m_sort(1, "N 2op")
        m_sort(33, "N 34op")
        m_sort(1, "batched32 2op", batched=True)
    if "stage" in which:
        m_stage()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
