"""Benchmark driver: ONE JSON line on stdout, runs on the real TPU chip.

Emits the full metric set every round (round-1 verdict items 9-10) so
cross-round drift is visible: G1 MSM (primary), G2 MSM, base + kernel-path
NTT, quotient pipeline, golden end-to-end prove (with per-phase ms), an
UltraGroth prove (mirroring the reference's only built-in instrumentation,
/root/reference/src/ultra_groth.cpp:199-239), and a 2^18+-constraint
end-to-end prove on a device-generated zkey.

Failure-safety (round-2 verdict item 1: BENCH_r02 was rc=124 with no
output): a watchdog thread prints the partial JSON line and exits 0 when
the wall-clock budget expires, and SIGTERM/SIGINT (the driver's `timeout`)
trigger the same partial emit — the bench can no longer end a round with
no number.  Phases run in priority order; each phase's results land in
the shared dict the moment it completes.

MSM metric inputs are DISTINCT points (k*G for distinct k via the batched
fixed-base mul): tiling a small point set repeats points inside buckets,
which can trip the incomplete-madd exception flag and redo whole drains
through the complete formula (measured 1.06x at 2^18 — small, but real
MSMs never pay it; experiments/measure_r3b.log).

The reference publishes no quantitative numbers (BASELINE.md) -
vs_baseline is reported against the BASELINE.json north-star target of
10^6 G1 MSM points/s/chip until a measured rapidsnark number exists.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import signal
import sys
import threading
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
T0 = time.perf_counter()

OUT: dict = {}
_ARGS = None
_EMITTED = threading.Event()


def _emit_json() -> None:
    """Print the (possibly partial) one-line JSON result exactly once."""
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    target = 1_000_000.0  # BASELINE.json north-star points/s/chip
    value = OUT.pop("value", 0.0)
    log_n = getattr(_ARGS, "log_n", 18) if _ARGS else 18
    OUT.pop("_phase", None)
    print(json.dumps({
        "metric": f"g1_msm_2^{log_n}_points_per_sec",
        "value": value,
        "unit": "points/s",
        "vs_baseline": round(value / target, 4),
        "elapsed_s": round(time.perf_counter() - T0, 1),
        **OUT,
    }), flush=True)


_CHILD = [None]        # live phase subprocess (parent mode), for cleanup


def _die_with_partial(reason: str) -> None:
    OUT["incomplete"] = reason
    if OUT.get("_phase"):
        OUT["interrupted_phase"] = OUT["_phase"]
    if _CHILD[0] is not None and _CHILD[0].poll() is None:
        _CHILD[0].kill()
    _emit_json()
    os._exit(0)


def _arm_watchdog(budget_s: float) -> None:
    """The budget is enforced even when a remote-relay compile hangs the
    main thread (uninterruptible): the watchdog emits partial results and
    hard-exits 0."""
    t = threading.Timer(budget_s, lambda: _die_with_partial("budget"))
    t.daemon = True
    t.start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda s, f: _die_with_partial(f"signal {s}"))


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
        OUT["error"] = ("device unreachable (relay down?): "
                        + result.get("error", f"probe timeout {timeout_s}s"))
        _emit_json()
        sys.exit(0)
    OUT["device"] = result["device"]


def _sync(x):
    """True device sync: block_until_ready does not sync through the axon
    relay; force a tiny host readback instead."""
    leaf = __import__("jax").tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:2])


def _stage(jax, *arrays):
    """Move inputs to the device BEFORE timing: the axon relay transfers
    ~85 MB/s, so host-resident operands would charge ~600 ms of H2D per
    iteration to a compute metric (the prover keeps zkey points device-
    resident across proves; witness upload is timed separately)."""
    import jax.numpy as jnp
    out = jax.tree_util.tree_map(jnp.asarray, arrays)
    _sync(out[0])
    return out


def _rand_scalars(log_n: int, seed: int):
    rng = np.random.default_rng(seed)
    scalars = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    scalars[15] &= 0x2FFF  # < 0x3000... < r: canonical-form contract
    return scalars


def _distinct_g1_points(jax, log_n: int):
    """2^log_n DISTINCT G1 points: k*G for k = 1..N via the device
    fixed-base mul (32 gather+madd steps; testkit/dsetup._fb_run).
    Generated in <=2^22 tiles so the xyzz intermediates stay well inside
    HBM at 2^24 (the MSM itself only holds affine planes + sort arrays)."""
    from ultragroth_tpu.testkit.dsetup import _fixed_base_points
    from ultragroth_tpu.ops import limbs as lb
    n = 1 << log_n
    tile = min(n, 1 << 22)
    xs, ys, infs = [], [], []
    for lo in range(0, n, tile):
        ks = lb.u32_to_planes(np.arange(lo + 1, lo + tile + 1,
                                        dtype=np.uint32))
        x, y, inf = _fixed_base_points("g1", ks)
        # host round trip: device-computed arrays can carry non-default
        # layouts that specialize (and re-compile) the MSM program; np
        # provenance keeps the program identical to prover-shaped inputs
        xs.append(np.asarray(x))
        ys.append(np.asarray(y))
        infs.append(np.asarray(inf))
    if len(xs) == 1:
        return xs[0], ys[0], infs[0]
    return (np.concatenate(xs, axis=1), np.concatenate(ys, axis=1),
            np.concatenate(infs))


def bench_msm_g1(jax, log_n: int, c: int, iters: int = 3):
    from ultragroth_tpu.ops import msm as dmsm
    x, y, inf = _distinct_g1_points(jax, log_n)
    scalars = _rand_scalars(log_n, 7)
    x, y, inf, scalars = _stage(jax, x, y, inf, scalars)
    n = 1 << log_n
    _sync(dmsm.msm_g1(x, y, inf, scalars, c=c))       # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(dmsm.msm_g1(x, y, inf, scalars, c=c))
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_msm_g1_fixed(jax, log_n: int, iters: int = 3):
    """Fixed-base G1 MSM (precomputed 2^(cw)*P window-multiple table over
    the SAME distinct points/scalars as the standard metric).  The table
    build is per-circuit (zkey points are constants, amortized across
    proves by the create/prove C-API contract) and timed separately."""
    from ultragroth_tpu.ops import msm as dmsm
    x, y, inf = _distinct_g1_points(jax, log_n)
    scalars = _rand_scalars(log_n, 7)
    x, y, inf, scalars = _stage(jax, x, y, inf, scalars)
    t0 = time.perf_counter()
    packed, infp, c = dmsm.msm_fixed_table("g1", x, y, inf)
    _sync(packed)
    build_s = time.perf_counter() - t0
    _sync(dmsm.msm_g1_fixed(packed, infp, scalars, c))   # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(dmsm.msm_g1_fixed(packed, infp, scalars, c))
    dt = (time.perf_counter() - t0) / iters
    return (1 << log_n) / dt, dt, build_s, c


def bench_msm_g2(jax, log_n: int, c: int, iters: int = 2):
    """G2 MSM points/s: distinct k*G2 points via the fixed-base mul."""
    from ultragroth_tpu.ops import msm as dmsm
    from ultragroth_tpu.ops import limbs as lb
    from ultragroth_tpu.testkit.dsetup import _fixed_base_points
    n = 1 << log_n
    ks = lb.u32_to_planes(np.arange(1, n + 1, dtype=np.uint32))
    x, y, inf = _fixed_base_points("g2", ks)
    x = tuple(np.asarray(c) for c in x)
    y = tuple(np.asarray(c) for c in y)
    inf = np.asarray(inf)
    scalars = _rand_scalars(log_n, 11)
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
    a, = _stage(jax, _rand_fr_planes(log_n))
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


def _traced_phases(prover, *prove_args):
    """One extra prove with phase tracing (syncs between phases, which
    perturbs totals — so it never shares a timer with the steady run)."""
    os.environ["ULTRAGROTH_TRACE"] = "1"
    try:
        prover.prove(*prove_args)
    finally:
        del os.environ["ULTRAGROTH_TRACE"]
    return prover.last_phase_ms


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
    return dt, _traced_phases(prover, wt.values)


def bench_ultragroth(jax, chunks: int = 256, table: int = 128):
    """UltraGroth prove on the real chip (round-2 verdict item 7): the
    synthetic lookup fixture (protocol 1337), steady-state latency +
    per-phase ms mirroring src/ultra_groth.cpp:199-239, proof checked
    with the 5-pairing verifier."""
    from ultragroth_tpu.io.zkey import parse_ultragroth_zkey
    from ultragroth_tpu.io.wtns import parse_wtns
    from ultragroth_tpu.protocol.prover import JaxUltraGrothProver
    from ultragroth_tpu.protocol import ultragroth as ug
    from ultragroth_tpu.testkit.circuits import LookupCircuit
    from ultragroth_tpu.testkit.setup import ultragroth_setup

    rng = np.random.default_rng(17)
    circ = LookupCircuit(rng.integers(0, table, size=chunks), table)
    # HOST setup: seconds at this size, and it keeps the device-setup
    # pipeline's many programs out of the relay compile budget
    setup = ultragroth_setup(circ.r1cs, circ.round_indexes,
                             circ.final_indexes, circ.rand_indx, seed=9)
    zk = parse_ultragroth_zkey(np.frombuffer(setup.zkey_bytes, np.uint8))
    wt = parse_wtns(np.frombuffer(circ.uwtns_bytes(), np.uint8))
    prover = JaxUltraGrothProver(zk)
    proof, w_final = prover.prove(wt.values, wt)          # compile + warmup
    vk = ug.UltraGrothVerificationKey.from_json_dict(setup.vk_json)
    publics = ug.public_signals(w_final, zk.n_public, zk.rand_indx)
    ok = ug.verify(proof, publics, vk)
    t0 = time.perf_counter()
    prover.prove(wt.values, wt)
    dt = time.perf_counter() - t0
    return dt, bool(ok), _traced_phases(prover, wt.values, wt)


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
    return dt, setup_s, bool(ok), _traced_phases(prover, wtns)


def _run_phases_subproc(args) -> None:
    """Parent orchestration (the default, round-4 verdict item 4): every
    phase runs in its OWN subprocess (`bench.py --only <phase>`) with a
    per-phase budget, so one phase's cold-compile hang through the relay
    cannot wedge the phases behind it — the parent SIGKILLs the child
    and moves on (an in-process watchdog cannot interrupt a main thread
    stuck inside a PJRT compile RPC).  Children share .jax_cache_tpu;
    within one relay session warm programs load in seconds.

    The default total budget (1700 s) sits UNDER the driver's ~1800 s
    kill window, so the parent always emits its merged JSON line and
    exits 0 before the driver's `timeout` fires (BENCH_r02/r04 were
    rc=124 with in-process phase loops).  Phase order puts the headline
    MSM first (its cold compile is the big fixed cost: ~1100-1350 s when
    the relay session changed since the cache was written), then the
    cheap-when-warm phases; whatever doesn't fit is reported as skipped.
    """
    import subprocess
    # (phase, budget_s, min_leftover_to_start)
    # msmfix sits right after the cheap-when-warm ntt/quot: when its
    # programs are warm in .jax_cache_tpu it lands the fixed-base
    # headline in ~2 min, and when they are cold NOTHING later in the
    # plan could have fit either (prove/g2/ultra are ~4000 s cold via
    # the relay) — so trying it early is strictly better.
    plan = [("msm", 1450, 0), ("ntt", 500, 45), ("quot", 300, 45),
            ("msmfix", 700, 90), ("prove", 600, 60), ("g2", 500, 90),
            ("ultra", 500, 90), ("e2e", 9000, 900),
            ("msm24", 7000, 900)]
    if args.only is not None:
        plan = [p for p in plan if p[0] in args.only]
    for name, phase_budget, min_left in plan:
        left = args.budget_s - (time.perf_counter() - T0)
        if left < max(min_left, 90):
            OUT[f"{name}_skipped"] = "budget"
            continue
        budget = min(phase_budget, left - 30)
        OUT["_phase"] = name
        cmd = [sys.executable, str(REPO / "bench.py"), "--only", name,
               "--budget-s", str(budget), "--log-n", str(args.log_n),
               "--window", str(args.window), "--log-e2e", str(args.log_e2e)]
        t_ph = time.perf_counter()
        try:
            proc = subprocess.Popen(cmd, cwd=REPO,
                                    stdout=subprocess.PIPE, stderr=None)
            _CHILD[0] = proc
            try:
                out, _ = proc.communicate(timeout=budget + 120)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.communicate()
                raise
            finally:
                _CHILD[0] = None
            res = json.loads(out.decode().strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001 - timeout, bad JSON, crash
            OUT[f"{name}_error"] = str(e)[:160]
            print(f"[bench] phase {name} FAILED after "
                  f"{time.perf_counter() - t_ph:.0f}s: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
            continue
        for k in ("metric", "unit", "vs_baseline", "elapsed_s", "_phase",
                  "incomplete", "interrupted_phase"):
            res.pop(k, None)
        v = res.pop("value", 0.0)
        if name == "msm" and v:
            OUT["value"] = v
        OUT.update(res)
        print(f"[bench] phase {name} done in "
              f"{time.perf_counter() - t_ph:.0f}s "
              f"(elapsed {time.perf_counter() - T0:.0f}s)",
              file=sys.stderr, flush=True)
    OUT["_phase"] = None
    _emit_json()


def main():
    global _ARGS
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=18)
    ap.add_argument("--window", type=int, default=13)
    ap.add_argument("--log-e2e", type=int, default=20)
    ap.add_argument("--budget-s", type=float, default=1700,
                    help="hard wall-clock budget: the watchdog emits the "
                         "partial JSON line and exits 0 when it expires. "
                         "The default sits UNDER the driver's ~1800 s kill "
                         "window so the official artifact is rc=0 with "
                         "whatever phases fit (each phase is a subprocess "
                         "with its own cap; a cold 2^18 MSM recompile "
                         "after a relay-session change is ~1100-1350 s and "
                         "fits the msm phase cap).  Raise for full sweeps: "
                         "--budget-s 20000 runs e2e and 2^24 too")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of phases: msm ntt quot prove g2 ultra "
                         "e2e msm24; parent mode unless exactly one phase")
    args = ap.parse_args()
    _ARGS = args

    _arm_watchdog(args.budget_s)
    if args.only is None or len(args.only) != 1:
        _run_phases_subproc(args)
        return
    _probe_device()
    jax = _setup_jax()

    def p_msm():
        pps, dt = bench_msm_g1(jax, args.log_n, args.window)
        OUT["value"] = round(pps, 1)
        OUT["msm_latency_s"] = round(dt, 4)

    def p_ntt():
        try:
            dt = bench_ntt(jax, 20, fast=True)
            OUT["ntt_path"] = "fast"
        except Exception as e:  # noqa: BLE001 - kernel path may not lower
            OUT["ntt_fast_error"] = str(e)[:160]
            dt = bench_ntt(jax, 20, fast=False)
            OUT["ntt_path"] = "base"
        OUT["ntt_2^20_ms"] = round(dt * 1000, 1)
        OUT["ntt_2^20_points_per_sec"] = round((1 << 20) / dt, 1)

    def p_quot():
        OUT["quotient_2^20_ms"] = round(bench_quotient(jax, 20) * 1000, 1)

    def p_prove():
        dt, phases = bench_golden_prove(jax)
        OUT["golden_prove_s"] = round(dt, 4)
        if phases:
            OUT["golden_phases_ms"] = {k: round(v, 1)
                                       for k, v in phases.items()}

    def p_g2():
        # 2^16 (round-4 verdict item 6; the r4 2^14/c=13 number ran ~4
        # bucket steps — per-step overhead, not arithmetic, dominated)
        pps, dt = bench_msm_g2(jax, 16, 13)
        OUT["g2_msm_2^16_points_per_sec"] = round(pps, 1)
        OUT["g2_msm_latency_s"] = round(dt, 4)

    def p_ultra():
        dt, ok, phases = bench_ultragroth(jax)
        OUT["ultragroth_prove_s"] = round(dt, 4)
        OUT["ultragroth_verified"] = ok
        if phases:
            OUT["ultragroth_phases_ms"] = {k: round(v, 1)
                                           for k, v in phases.items()}

    def p_e2e():
        dt, setup_s, ok, phases = bench_e2e(jax, args.log_e2e)
        OUT[f"e2e_2^{args.log_e2e}_s"] = round(dt, 3)
        OUT[f"e2e_2^{args.log_e2e}_setup_s"] = round(setup_s, 1)
        OUT[f"e2e_2^{args.log_e2e}_verified"] = ok
        if phases:
            OUT["e2e_phases_ms"] = {k: round(v, 1) for k, v in phases.items()}

    def p_msmfix():
        pps, dt, build_s, cf = bench_msm_g1_fixed(jax, args.log_n)
        OUT[f"g1_msm_fixed_2^{args.log_n}_points_per_sec"] = round(pps, 1)
        OUT["msm_fixed_latency_s"] = round(dt, 4)
        OUT["msm_fixed_table_build_s"] = round(build_s, 1)
        OUT["msm_fixed_window"] = cf

    def p_msm24():
        # the north-star size (BASELINE.json: G1 MSM points/s/chip at
        # 2^24); per-step fixed costs amortize here, so this is the
        # design's best number.  One timed iter (~25 s each).
        pps, dt = bench_msm_g1(jax, 24, 16, iters=1)
        OUT["g1_msm_2^24_points_per_sec"] = round(pps, 1)
        OUT["msm24_latency_s"] = round(dt, 4)

    # priority order; the watchdog cuts whatever is left when the budget
    # expires, so early phases are the ones guaranteed a number
    phases = [("msm", p_msm), ("prove", p_prove), ("ntt", p_ntt),
              ("quot", p_quot), ("g2", p_g2), ("ultra", p_ultra),
              ("e2e", p_e2e), ("msm24", p_msm24), ("msmfix", p_msmfix)]
    for name, fn in phases:
        if args.only is not None and name not in args.only:
            continue
        if time.perf_counter() - T0 > 0.9 * args.budget_s:
            OUT[f"{name}_skipped"] = "budget"
            continue
        OUT["_phase"] = name
        t_ph = time.perf_counter()
        try:
            fn()
            print(f"[bench] phase {name} done in "
                  f"{time.perf_counter() - t_ph:.0f}s "
                  f"(elapsed {time.perf_counter() - T0:.0f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            OUT[f"{name}_error"] = str(e)[:200]
            print(f"[bench] phase {name} ERROR after "
                  f"{time.perf_counter() - t_ph:.0f}s: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
    OUT["_phase"] = None

    _emit_json()


if __name__ == "__main__":
    main()
