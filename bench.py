"""Benchmark driver: ONE JSON line on stdout, runs on the real TPU chip.

Primary metric (round 1): G1 Pippenger MSM throughput (points/s) on the
largest size that fits the round's compile budget, plus the golden
end-to-end prove latency as auxiliary fields.  The reference publishes no
quantitative numbers (BASELINE.md) - vs_baseline is reported against the
BASELINE.json north-star target of 10^6 points/s/chip until a measured
rapidsnark number exists.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def bench_msm(jax, log_n: int, c: int, iters: int = 3) -> float:
    """points/s for a G1 MSM of 2^log_n points (golden H-points tiled)."""
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.ops import limbs as lb
    from ultragroth_tpu.ops import msm as dmsm
    from ultragroth_tpu.protocol.prover import g1_section_to_planes

    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    x, y, inf = g1_section_to_planes(zk.points_h)     # 1024 points
    n = 1 << log_n
    reps = n // x.shape[1]
    x = np.tile(x, (1, reps))
    y = np.tile(y, (1, reps))
    inf = np.tile(inf, reps)
    rng = np.random.default_rng(7)
    scalars = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    scalars[15] &= 0x3FFF  # keep < r

    import numpy as _np

    def _sync(pt):
        # block_until_ready does not truly sync through the axon relay;
        # force a tiny host readback instead.
        return _np.asarray(jax.tree_util.tree_leaves(pt)[0][:2])

    out = dmsm.msm_g1(x, y, inf, scalars, c=c)
    _sync(out)                          # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dmsm.msm_g1(x, y, inf, scalars, c=c)
        _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_ntt(jax, log_n: int = 20) -> float:
    """Fr NTT latency (s) at 2^log_n, steady-state."""
    import numpy as np
    from ultragroth_tpu.ops import ntt as dntt

    def _sync(x):
        return np.asarray(x[0, :2])

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    out = dntt.ntt(a, log_n)
    _sync(out)
    t0 = time.perf_counter()
    out = dntt.ntt(out, log_n)
    _sync(out)
    return time.perf_counter() - t0


def bench_golden_prove(jax) -> float:
    """End-to-end golden prove latency (s), zkey resident, steady-state."""
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.io.wtns import parse_wtns
    from ultragroth_tpu.protocol.prover import JaxGroth16Prover

    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    wt = parse_wtns(open("/root/reference/testdata/witness.wtns", "rb").read())
    prover = JaxGroth16Prover(zk)
    prover.prove(wt.values)             # compile + warmup
    t0 = time.perf_counter()
    prover.prove(wt.values)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=18)
    ap.add_argument("--window", type=int, default=13)
    ap.add_argument("--skip-ntt", action="store_true")
    ap.add_argument("--with-prove", action="store_true",
                    help="also time the golden end-to-end prove (adds several minutes of one-time G2-MSM compile on a cold cache)")
    args = ap.parse_args()

    jax = _setup_jax()
    pps, msm_dt = bench_msm(jax, args.log_n, args.window)
    extra = {}
    if not args.skip_ntt:
        try:
            ntt_dt = bench_ntt(jax)
            extra["ntt_2^20_ms"] = round(ntt_dt * 1000, 1)
            extra["ntt_2^20_points_per_sec"] = round((1 << 20) / ntt_dt, 1)
        except Exception as e:  # noqa: BLE001
            extra["ntt_error"] = str(e)[:200]
    if args.with_prove:
        try:
            extra["golden_prove_s"] = round(bench_golden_prove(jax), 4)
        except Exception as e:  # noqa: BLE001
            extra["golden_prove_error"] = str(e)[:200]

    target = 1_000_000.0  # BASELINE.json north-star points/s/chip
    print(json.dumps({
        "metric": f"g1_msm_2^{args.log_n}_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / target, 4),
        "msm_latency_s": round(msm_dt, 4),
        "device": str(jax.devices()[0]),
        **extra,
    }))


if __name__ == "__main__":
    main()
