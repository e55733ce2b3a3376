"""Round-4 decision measurements on the real TPU (v5e via axon relay).

Questions (PERF.md round-3 floor analysis; VERDICT round-2 items 3+5):
  lazy18 / base18 : does in-kernel LAZY REDUCTION (ULTRAGROTH_LAZY=1)
                    deliver its projected ~25% mont-mul cut on the full
                    2^18/c=13 MSM?  (The one remaining >=500K pts/s lever.)
  base20 / lazy20 : MSM at 2^20 — slack amortizes, fixed costs shrink;
                    candidate new primary bench size.  The Mosaic kernel
                    instances are N-INDEPENDENT (bucket-loop width is
                    W * 2^(c-1)), so only the XLA-level program recompiles.
  base22 / lazy22 : MSM at 2^22 (BASELINE.md matrix row).  Distinct points
                    at 2^22 via the fixed-base mul.
  msm24           : MSM at 2^24 (north-star row) with 2^20-distinct points
                    tiled 16x (fixed-base gen at 2^24 would dominate the
                    budget; dup-redo factor measured 1.05x, measure_r3b).
  ntt24           : Fr NTT at 2^24 (BASELINE.md matrix row), fast + base.

Run: python experiments/measure_r4.py [phases]
Each phase runs in a SUBPROCESS (ULTRAGROTH_LAZY is read at trace time)
and is relay-death-tolerant; the parent prints a status line per phase.
"""
import hashlib
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALL = ["base18", "lazy18", "base20", "lazy20", "base22", "lazy22",
       "ntt24", "msm24"]


def _msm_inputs(log_n, tile_from=None):
    """Distinct k*G points with np provenance (bench.py input hygiene:
    device-layout arrays would specialize a different MSM program than
    the prover-shaped np inputs the bench times)."""
    from measure_r3b import distinct_points, rand_scalars
    src = tile_from or log_n
    x, y, inf = distinct_points(src)
    x, y, inf = np.asarray(x), np.asarray(y), np.asarray(inf)
    if tile_from:
        reps = 1 << (log_n - tile_from)
        x, y, inf = (np.tile(x, (1, reps)), np.tile(y, (1, reps)),
                     np.tile(inf, reps))
    return x, y, inf, rand_scalars(log_n, 7)


def run_msm(log_n, c=13, iters=3, tile_from=None):
    import jax
    import jax.numpy as jnp
    from measure_r3b import setup_jax, sync, timeit
    setup_jax()
    from ultragroth_tpu.ops import msm as dmsm
    from ultragroth_tpu.ops.curve import g1_ops
    lazy = os.environ.get("ULTRAGROTH_LAZY", "0")
    t0 = time.time()
    x, y, inf, sc = _msm_inputs(log_n, tile_from)
    print(f"  inputs 2^{log_n}: {time.time()-t0:.0f}s", flush=True)
    x, y, inf, sc = map(jnp.asarray, (x, y, inf, sc))
    sync(x)
    t = timeit(f"  msm 2^{log_n}/c={c} lazy={lazy}",
               lambda: dmsm.msm_g1(x, y, inf, sc, c=c), iters=iters)
    out = dmsm.msm_g1(x, y, inf, sc, c=c)
    ha = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(g1_ops().to_affine(out)):
        ha.update(np.asarray(leaf).tobytes())
    print(f"  affine sha256: {ha.hexdigest()[:16]}", flush=True)
    if t:
        print(f"  rate: {(1 << log_n) / t:,.0f} pts/s", flush=True)


def run_ntt24():
    import jax.numpy as jnp
    from measure_r3b import setup_jax, sync, timeit
    setup_jax()
    from ultragroth_tpu.ops import ntt as dntt
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, size=(16, 1 << 24), dtype=np.uint32)
    a[15] &= 0x3FFF
    a = jnp.asarray(a)
    sync(a)
    for name, fn in (("fast", dntt.ntt_fast), ("base", dntt.ntt)):
        t = timeit(f"  ntt_{name} 2^24", lambda fn=fn: fn(a, 24), iters=2)
        if t:
            print(f"  ntt_{name} rate: {(1 << 24) / t / 1e6:.1f} M pts/s",
                  flush=True)


def run_phase(phase):
    if phase == "ntt24":
        run_ntt24()
    elif phase == "msm24":
        # c=13 reuses the 2^18/2^20 Mosaic kernel set (lanes = W*2^(c-1)
        # is N-independent); c=16 would cost a fresh multi-minute kernel
        # compile sweep for a similar rate
        run_msm(24, c=13, iters=2, tile_from=20)
    else:
        lazy = phase.startswith("lazy")
        os.environ["ULTRAGROTH_LAZY"] = "1" if lazy else "0"
        log_n = int(phase[4:])
        run_msm(log_n, c=13, iters=5 if log_n == 18 else 3)


if __name__ == "__main__":
    phases = sys.argv[1:] or ALL
    if len(phases) == 1:
        run_phase(phases[0])
    else:
        for ph in phases:
            t0 = time.time()
            print(f"== phase {ph} ==", flush=True)
            p = subprocess.run([sys.executable, __file__, ph],
                               cwd=os.path.dirname(os.path.abspath(__file__)),
                               check=False)
            status = "ok" if p.returncode == 0 else f"FAILED rc={p.returncode}"
            print(f"[phase {ph}: {time.time() - t0:.0f}s total, {status}]",
                  flush=True)
