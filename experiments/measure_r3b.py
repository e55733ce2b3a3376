"""Round-3 decision measurements on the real TPU (v5e via axon relay).

Questions this answers (PERF.md "next levers", VERDICT items 3-4):
  A. mont-mul: MXU-REDC fused kernel (now Mosaic-lowerable: int32-routed
     casts + exact-byte dot operands) vs the fused CIOS kernel.
  B. does the bench's tiled-duplicate point set really trip the
     incomplete-madd redo (~1.8x)?  distinct vs tiled points, same
     (warm) MSM program.
  C. per-step cost split of the bucket loop: gather-only vs
     madd_fast-kernel-only at the real loop width (81920 lanes).
  D. golden prove with the batched one-call finalize.
  E. (only if A wins >= 1.3x) full MSM with ULTRAGROTH_MXU_FIELD=1 -
     fresh multi-minute compile, so gated on A.

Run: python experiments/measure_r3b.py [phases]   (default: A B C D)
Each phase is independent and relay-death-tolerant.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

PHASES = sys.argv[1:] or ["A", "B", "C", "D"]


def setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:2])


def timeit(name, fn, iters=3):
    """fn MUST be a jitted callable (or dispatch only jitted work): an
    eager fused_map kernel call RETRACES its flat body every call —
    measure_r3b pass-1 timed 2.3 s of Python tracing as 'CIOS kernel
    steady' and 19 s as 'madd' that way.  Callers wrap with jax.jit."""
    try:
        t0 = time.perf_counter()
        sync(fn())
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms steady (compile+first {tc:.1f}s)",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def rand_scalars(log_n, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    s[15] &= 0x2FFF
    return s


def phase_a(jax):
    print("== A: mont-mul MXU-REDC vs CIOS (2^20) ==", flush=True)
    import jax.numpy as jnp
    from ultragroth_tpu.ops import kernels
    from mxu_redc import pallas_mont_mul_mxu
    n = 1 << 20
    a = jnp.asarray(rand_scalars(20, 3))
    b = jnp.asarray(rand_scalars(20, 4))
    sync((a + b))
    cios_j = jax.jit(lambda x, y: kernels.fr_mont_mul()(x, y))
    mxu1024 = jax.jit(lambda x, y: pallas_mont_mul_mxu(x, y, block=1024))
    mxu512 = jax.jit(lambda x, y: pallas_mont_mul_mxu(x, y, block=512))
    t_base = timeit("  CIOS fused kernel", lambda: cios_j(a, b))
    t_mxu = timeit("  MXU-REDC pallas b=1024", lambda: mxu1024(a, b))
    timeit("  MXU-REDC pallas b=512", lambda: mxu512(a, b))
    if t_base and t_mxu:
        # exactness on device, not just interpret (ADVICE round-2 medium)
        got = np.asarray(mxu1024(a, b))
        want = np.asarray(cios_j(a, b))
        ok = (got == want).all()
        print(f"  bit-exact vs CIOS on device: {bool(ok)}", flush=True)
        print(f"  speedup: {t_base / t_mxu:.2f}x", flush=True)
    return t_base, t_mxu


def phase_a2(jax):
    """In-loop mont-mul cost, dispatch-amortized: 32 chained muls inside
    ONE jit (the standalone numbers are ~20-30 ms relay-dispatch noise).
    This ratio is what the MSM's in-while-loop madd actually sees."""
    print("== A2: chained mont-mul (32x in one jit), 2^20 ==", flush=True)
    import jax.numpy as jnp
    from ultragroth_tpu.ops import kernels
    from mxu_redc import pallas_mont_mul_mxu
    a = jnp.asarray(rand_scalars(20, 3))
    b = jnp.asarray(rand_scalars(20, 4))
    sync((a + b))
    K = 32

    def chain(mul):
        @jax.jit
        def run(x, y):
            return jax.lax.fori_loop(0, K, lambda i, t: mul(t, y), x)
        return run

    cios = chain(lambda x, y: kernels.fr_mont_mul()(x, y))
    mxu = chain(lambda x, y: pallas_mont_mul_mxu(x, y, block=512))
    tc = timeit(f"  CIOS x{K} chained", lambda: cios(a, b))
    tm = timeit(f"  MXU-REDC x{K} chained", lambda: mxu(a, b))
    if tc and tm:
        n = 1 << 20
        print(f"  per-mul: CIOS {tc/K*1e6:.1f} ns*batch "
              f"({n*K/tc/1e6:.0f} M mul/s) vs MXU {tm/K*1e6:.1f} "
              f"({n*K/tm/1e6:.0f} M mul/s); ratio {tc/tm:.2f}x", flush=True)


def distinct_points(log_n):
    from ultragroth_tpu.testkit.dsetup import _fixed_base_points
    from ultragroth_tpu.ops import limbs as lb
    ks = lb.u32_to_planes(np.arange(1, (1 << log_n) + 1, dtype=np.uint32))
    return _fixed_base_points("g1", ks)


def tiled_points(log_n):
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.protocol.prover import g1_section_to_planes
    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    x, y, inf = g1_section_to_planes(zk.points_h)
    reps = (1 << log_n) // x.shape[1]
    return np.tile(x, (1, reps)), np.tile(y, (1, reps)), np.tile(inf, reps)


def phase_b(jax):
    print("== B: distinct vs tiled points, full msm 2^18/c=13 ==", flush=True)
    import jax.numpy as jnp
    from ultragroth_tpu.ops import msm as dmsm
    sc = jnp.asarray(rand_scalars(18, 7))
    sync(sc)
    t0 = time.perf_counter()
    xd, yd, infd = distinct_points(18)
    xd, yd, infd = jnp.asarray(xd), jnp.asarray(yd), jnp.asarray(infd)
    sync(xd)
    print(f"  fixed-base point gen: {time.perf_counter()-t0:.1f}s",
          flush=True)
    td = timeit("  msm distinct", lambda: dmsm.msm_g1(xd, yd, infd, sc, c=13))
    xt, yt, inft = (jnp.asarray(v) for v in tiled_points(18))
    sync(xt)
    tt = timeit("  msm tiled-dup", lambda: dmsm.msm_g1(xt, yt, inft, sc, c=13))
    if td and tt:
        print(f"  dup-redo factor: {tt/td:.2f}x ; distinct rate "
              f"{(1<<18)/td:,.0f} pts/s", flush=True)


def phase_c(jax):
    print("== C: bucket-loop per-step split (81920 lanes) ==", flush=True)
    import jax.numpy as jnp
    from ultragroth_tpu.ops import kernels
    from ultragroth_tpu.ops.msm import _pack_points_planes, _unpack_cols
    lanes = 81920
    x, y, inf = distinct_points(18)
    packed = _pack_points_planes(jnp.asarray(x), jnp.asarray(y))
    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(0, 1 << 18, size=lanes, dtype=np.int32))
    sync(packed)

    gather = jax.jit(lambda p, i: p[:, i])
    timeit(f"  gather [{packed.shape[0]}, {lanes}] plane-major",
           lambda: gather(packed, idx), iters=5)

    cols = gather(packed, idx)
    gx, gy = _unpack_cols(cols, x, y)
    from ultragroth_tpu.ops.curve import g1_ops
    acc = jax.jit(lambda gx, gy: g1_ops().affine_to_xyzz(
        gx, gy, jnp.zeros(lanes, bool)))(gx, gy)
    sync(acc)
    neg = jnp.zeros(lanes, bool)
    valid = jnp.ones(lanes, bool)
    madd = jax.jit(lambda a_, x_, y_: kernels.curve_madd_fast("g1")(
        a_, x_, y_, neg, valid)[0])
    timeit("  madd_fast kernel [81920]",
           lambda: madd(acc, gx, gy), iters=5)


def phase_d(jax):
    print("== D: golden prove, batched finalize ==", flush=True)
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.io.wtns import parse_wtns
    from ultragroth_tpu.protocol.prover import JaxGroth16Prover
    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    wt = parse_wtns(open("/root/reference/testdata/witness.wtns", "rb").read())
    prover = JaxGroth16Prover(zk)

    def run():  # prove() ends on a host readback: already synced
        prover.prove(wt.values)
        return np.zeros(2)

    timeit("  golden prove steady", run, iters=3)
    os.environ["ULTRAGROTH_TRACE"] = "1"
    try:
        prover.prove(wt.values)
    finally:
        del os.environ["ULTRAGROTH_TRACE"]


def phase_e(jax):
    print("== E: full msm 2^18 with ULTRAGROTH_MXU_FIELD=1 ==", flush=True)
    os.environ["ULTRAGROTH_MXU_FIELD"] = "1"
    import jax.numpy as jnp
    from ultragroth_tpu.ops import msm as dmsm
    x, y, inf = distinct_points(18)
    x, y, inf = jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)
    sc = jnp.asarray(rand_scalars(18, 7))
    sync(sc)
    t = timeit("  msm distinct (MXU field)",
               lambda: dmsm.msm_g1(x, y, inf, sc, c=13))
    if t:
        print(f"  rate {(1<<18)/t:,.0f} pts/s", flush=True)
    del os.environ["ULTRAGROTH_MXU_FIELD"]


def main():
    jax = setup_jax()
    print("device=", jax.devices()[0], flush=True)
    fns = {"A": phase_a, "A2": phase_a2, "B": phase_b, "C": phase_c,
           "D": phase_d, "E": phase_e}
    for ph in PHASES:
        try:
            fns[ph](jax)
        except Exception as e:  # noqa: BLE001
            print(f"phase {ph}: ERROR {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
