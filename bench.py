"""Benchmark driver: ONE JSON line on stdout, runs on the real TPU chip.

Emits the full metric set every round (round-1 verdict items 9-10) so
cross-round drift is visible: G1 MSM (primary), base + kernel-path NTT,
quotient pipeline, golden end-to-end prove (with per-phase ms), G2 MSM,
and a 2^18-constraint end-to-end prove on a device-generated zkey.  Each
phase is guarded by a wall-clock budget: when the remaining budget is too
small (remote-relay compiles are minutes each), later phases are skipped
and reported as such rather than timing out the whole bench.

The reference publishes no quantitative numbers (BASELINE.md) -
vs_baseline is reported against the BASELINE.json north-star target of
10^6 G1 MSM points/s/chip until a measured rapidsnark number exists.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
T0 = time.perf_counter()


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def _probe_device(timeout_s: float = 300.0):
    """Bounded device-liveness probe: the axon relay can be down for hours
    (worker crash), and jax device init then HANGS instead of raising —
    without this the whole bench would burn its budget on a dead relay.
    Runs the init + a tiny readback in a daemon thread and gives up after
    timeout_s, emitting a diagnosable JSON line."""
    import threading
    result: dict = {}

    def probe():
        try:
            import jax
            import jax.numpy as jnp
            result["device"] = str(jax.devices()[0])
            np.asarray(jnp.ones((2,), jnp.uint32) + 1)
            result["ok"] = True
        except Exception as e:  # noqa: BLE001
            result["error"] = str(e)[:200]

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not result.get("ok"):
        print(json.dumps({
            "metric": "g1_msm_points_per_sec", "value": 0.0,
            "unit": "points/s", "vs_baseline": 0.0,
            "error": ("device unreachable (relay down?): "
                      + result.get("error", f"probe timeout {timeout_s}s")),
        }))
        sys.exit(0)


def _sync(x):
    """True device sync: block_until_ready does not sync through the axon
    relay; force a tiny host readback instead."""
    leaf = __import__("jax").tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:2])


def _tiled_g1_points(log_n: int):
    """Golden H-points (1024) tiled to 2^log_n plus random 254-bit scalars."""
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.protocol.prover import g1_section_to_planes
    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    x, y, inf = g1_section_to_planes(zk.points_h)
    n = 1 << log_n
    reps = n // x.shape[1]
    x, y = np.tile(x, (1, reps)), np.tile(y, (1, reps))
    inf = np.tile(inf, reps)
    rng = np.random.default_rng(7)
    scalars = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    scalars[15] &= 0x2FFF  # < 0x3000... < r: canonical-form contract
    return x, y, inf, scalars, zk


def _stage(jax, *arrays):
    """Move inputs to the device BEFORE timing: the axon relay transfers
    ~85 MB/s, so host-resident operands would charge ~600 ms of H2D per
    iteration to a compute metric (the prover keeps zkey points device-
    resident across proves; witness upload is timed separately)."""
    import jax.numpy as jnp
    out = jax.tree_util.tree_map(jnp.asarray, arrays)
    _sync(out[0])
    return out


def bench_msm_g1(jax, log_n: int, c: int, iters: int = 3):
    from ultragroth_tpu.ops import msm as dmsm
    x, y, inf, scalars, _ = _tiled_g1_points(log_n)
    x, y, inf, scalars = _stage(jax, x, y, inf, scalars)
    n = 1 << log_n
    _sync(dmsm.msm_g1(x, y, inf, scalars, c=c))       # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(dmsm.msm_g1(x, y, inf, scalars, c=c))
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_msm_g2(jax, log_n: int, c: int, iters: int = 2):
    """G2 MSM points/s (B2-section points tiled to 2^log_n)."""
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.ops import msm as dmsm
    from ultragroth_tpu.protocol.prover import g2_section_to_planes
    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    x, y, inf = g2_section_to_planes(zk.points_b2)    # 1003 points
    n = 1 << log_n
    reps = -(-n // x[0].shape[1])
    x = tuple(np.tile(c_, (1, reps))[:, :n] for c_ in x)
    y = tuple(np.tile(c_, (1, reps))[:, :n] for c_ in y)
    inf = np.tile(inf, reps)[:n]
    rng = np.random.default_rng(11)
    scalars = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    scalars[15] &= 0x2FFF  # < r (canonical-form contract)
    x, y, inf, scalars = _stage(jax, x, y, inf, scalars)
    _sync(dmsm.msm_g2(x, y, inf, scalars, c=c))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(dmsm.msm_g2(x, y, inf, scalars, c=c))
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def _rand_fr_planes(log_n: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    a[15] &= 0x3FFF
    return a


def bench_ntt(jax, log_n: int = 20, fast: bool = False) -> float:
    from ultragroth_tpu.ops import ntt as dntt
    fn = dntt.ntt_fast if fast else dntt.ntt
    a = _rand_fr_planes(log_n)
    out = fn(a, log_n)
    _sync(out)
    t0 = time.perf_counter()
    _sync(fn(out, log_n))
    return time.perf_counter() - t0


def bench_quotient(jax, log_n: int = 20) -> float:
    from ultragroth_tpu.ops import ntt as dntt
    a = _rand_fr_planes(log_n, 5)
    b = _rand_fr_planes(log_n, 6)
    a, b = _stage(jax, a, b)
    _sync(dntt.quotient_scalars(a, b, log_n))
    t0 = time.perf_counter()
    _sync(dntt.quotient_scalars(a, b, log_n))
    return time.perf_counter() - t0


def bench_golden_prove(jax):
    """Steady-state golden prove latency (s) + per-phase breakdown."""
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
    dt = time.perf_counter() - t0
    # separate traced prove for the per-phase breakdown (tracing syncs
    # between phases, which would perturb the timed run above)
    import os
    os.environ["ULTRAGROTH_TRACE"] = "1"
    try:
        prover.prove(wt.values)
    finally:
        del os.environ["ULTRAGROTH_TRACE"]
    return dt, prover.last_phase_ms


def bench_e2e(jax, log_constraints: int):
    """Device-side setup of a 2^log_constraints square-chain circuit, then
    steady-state prove (round-1 verdict item 3: nothing beyond 2^14 had
    ever been proven)."""
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.testkit.circuits import square_chain_circuit
    from ultragroth_tpu.testkit.dsetup import groth16_setup_fast
    from ultragroth_tpu.protocol.prover import JaxGroth16Prover
    from ultragroth_tpu.protocol import groth16 as g16
    from ultragroth_tpu.io.fieldenc import array_to_ints
    t0 = time.perf_counter()
    r1cs, wtns = square_chain_circuit((1 << log_constraints) - 8, seed=5)
    setup = groth16_setup_fast(r1cs, seed=6)
    setup_s = time.perf_counter() - t0
    zk = parse_groth16_zkey(np.frombuffer(setup.zkey_bytes, np.uint8))
    prover = JaxGroth16Prover(zk)
    proof = prover.prove(wtns)          # compile + warmup
    vk = g16.VerificationKey.from_json_dict(setup.vk_json)
    ok = g16.verify(proof, array_to_ints(wtns[1:zk.n_public + 1]), vk)
    t1 = time.perf_counter()
    prover.prove(wtns)
    dt = time.perf_counter() - t1
    import os
    os.environ["ULTRAGROTH_TRACE"] = "1"   # traced extra prove: phase split
    try:
        prover.prove(wtns)
    finally:
        del os.environ["ULTRAGROTH_TRACE"]
    return dt, setup_s, bool(ok), prover.last_phase_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=18)
    ap.add_argument("--window", type=int, default=13)
    ap.add_argument("--log-e2e", type=int, default=18)
    ap.add_argument("--budget-s", type=float, default=7200,
                    help="skip later phases when elapsed wall time plus the "
                         "phase's expected compile cost would exceed this")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of phases: msm ntt quot prove g2 e2e")
    args = ap.parse_args()

    _probe_device()
    jax = _setup_jax()
    out: dict = {"device": str(jax.devices()[0])}

    # (name, expected cost incl. cold compile, fn filling `out`)
    def p_msm():
        pps, dt = bench_msm_g1(jax, args.log_n, args.window)
        out["value"] = round(pps, 1)
        out["msm_latency_s"] = round(dt, 4)

    def p_ntt():
        try:
            dt = bench_ntt(jax, 20, fast=True)
            out["ntt_path"] = "fast"
        except Exception as e:  # noqa: BLE001 - kernel path may not lower
            out["ntt_fast_error"] = str(e)[:160]
            dt = bench_ntt(jax, 20, fast=False)
            out["ntt_path"] = "base"
        out["ntt_2^20_ms"] = round(dt * 1000, 1)
        out["ntt_2^20_points_per_sec"] = round((1 << 20) / dt, 1)

    def p_quot():
        out["quotient_2^20_ms"] = round(bench_quotient(jax, 20) * 1000, 1)

    def p_prove():
        dt, phases = bench_golden_prove(jax)
        out["golden_prove_s"] = round(dt, 4)
        if phases:
            out["golden_phases_ms"] = {k: round(v, 1)
                                       for k, v in phases.items()}

    def p_g2():
        pps, dt = bench_msm_g2(jax, 14, 13)
        out["g2_msm_2^14_points_per_sec"] = round(pps, 1)
        out["g2_msm_latency_s"] = round(dt, 4)

    def p_e2e():
        dt, setup_s, ok, phases = bench_e2e(jax, args.log_e2e)
        out[f"e2e_2^{args.log_e2e}_s"] = round(dt, 3)
        out[f"e2e_2^{args.log_e2e}_setup_s"] = round(setup_s, 1)
        out[f"e2e_2^{args.log_e2e}_verified"] = ok
        if phases:
            out[f"e2e_phases_ms"] = {k: round(v, 1)
                                     for k, v in phases.items()}

    phases = [("msm", 1500, p_msm), ("ntt", 300, p_ntt),
              ("quot", 400, p_quot), ("prove", 900, p_prove),
              ("g2", 1800, p_g2), ("e2e", 1800, p_e2e)]
    for name, est_s, fn in phases:
        if args.only is not None and name not in args.only:
            continue
        if time.perf_counter() - T0 + est_s > args.budget_s:
            out[f"{name}_skipped"] = "budget"
            continue
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            out[f"{name}_error"] = str(e)[:200]

    target = 1_000_000.0  # BASELINE.json north-star points/s/chip
    value = out.pop("value", 0.0)
    print(json.dumps({
        "metric": f"g1_msm_2^{args.log_n}_points_per_sec",
        "value": value,
        "unit": "points/s",
        "vs_baseline": round(value / target, 4),
        **out,
    }))


if __name__ == "__main__":
    main()
