"""TPU-backed Groth16 prover: the device twin of OracleGroth16Prover.

Pipeline parity: Groth16::Prover::prove (/root/reference/src/groth16.cpp:
48-203) - 4 witness MSMs, sparse coefficient scatter, 3x coset-NTT, H MSM,
blinding algebra.  All heavy phases run as jitted limb-plane kernels
(ops/msm.py, ops/ntt.py); the O(1) blinding algebra on the five MSM outputs
reuses the audited host oracle (protocol/groth16.py:finalize_proof).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fieldenc import u32_view
from ..ops import limbs as lb
from ..ops import msm as dmsm
from ..ops import ntt as dntt
from ..ops.curve import g1_ops, g2_ops
from ..ops.field import fr, fq
from .groth16 import (Proof, decode_g1, decode_g2, finalize_proof,
                      random_blinding)


def g1_section_to_planes(arr: np.ndarray):
    """zkey G1 section [N, 2, 8] u32 Montgomery words -> (x, y, inf)."""
    x = lb.words_to_planes(arr[:, 0, :])
    y = lb.words_to_planes(arr[:, 1, :])
    inf = (arr[:, 0, :] == 0).all(axis=-1) & (arr[:, 1, :] == 0).all(axis=-1)
    return x, y, inf


def g2_section_to_planes(arr: np.ndarray):
    """zkey G2 section [N, 4, 8] -> ((x0, x1), (y0, y1), inf)."""
    planes = [lb.words_to_planes(arr[:, i, :]) for i in range(4)]
    inf = (arr.reshape(arr.shape[0], -1) == 0).all(axis=-1)
    return (planes[0], planes[1]), (planes[2], planes[3]), inf


def xyzz_to_oracle_g1(pt):
    """Device xyzz G1 point (leaves [L]) -> oracle affine int pair."""
    x, y, inf = g1_ops().to_affine(pt)
    F = fq()
    xi = lb.planes_to_ints(np.asarray(F.from_mont(x)))[0]
    yi = lb.planes_to_ints(np.asarray(F.from_mont(y)))[0]
    return None if bool(np.asarray(inf)) else (xi, yi)


@jax.jit
def _normalize_outputs(g1_pts, g2_pt):
    """All five MSM outputs -> standard-domain affine planes in ONE device
    call: the g1 points batch into one to_affine (one shared Fermat
    inversion chain over the 4-wide batch) and the g2 point rides the same
    program, so finalization costs ONE dispatch + ONE readback instead of
    five of each (at ~150 ms per relay round trip the old per-point path
    charged ~830 ms of pure latency to `finalize`)."""
    stacked = tuple(jnp.stack([p[i] for p in g1_pts], axis=-1)
                    for i in range(4))                 # leaves [L, 4]
    F = fq()
    x, y, inf = g1_ops().to_affine(stacked)
    g1 = (F.from_mont(x), F.from_mont(y), inf)
    x2, y2, inf2 = g2_ops().to_affine(g2_pt)
    g2 = (tuple(F.from_mont(c) for c in x2),
          tuple(F.from_mont(c) for c in y2), inf2)
    return g1, g2


def _oracle_points(g1_pts, g2_pt):
    """Batched device->host finalization: returns ([4 affine-int G1 or
    None], G2 affine-int pair or None)."""
    (x, y, inf), (x2, y2, inf2) = jax.device_get(
        _normalize_outputs(tuple(g1_pts), g2_pt))
    xs = lb.planes_to_ints(np.asarray(x))
    ys = lb.planes_to_ints(np.asarray(y))
    infs = np.asarray(inf)
    g1 = [None if bool(infs[i]) else (xs[i], ys[i]) for i in range(4)]
    vals = [lb.planes_to_ints(np.asarray(c))[0] for c in (*x2, *y2)]
    g2 = (None if bool(np.asarray(inf2))
          else ((vals[0], vals[1]), (vals[2], vals[3])))
    return g1, g2


def xyzz_to_oracle_g2(pt):
    x, y, inf = g2_ops().to_affine(pt)
    F = fq()
    vals = [lb.planes_to_ints(np.asarray(F.from_mont(c)))[0]
            for c in (x[0], x[1], y[0], y[1])]
    return None if bool(np.asarray(inf)) else ((vals[0], vals[1]),
                                               (vals[2], vals[3]))


def _build_fixed_tables(mesh, **named_points) -> dict:
    """Fixed-base MSM tables for the per-circuit constant point sets
    (ops/msm.py msm_fixed_table), largest-first under a memory budget.

    Opt-in: ULTRAGROTH_FIXED_MSM_MB sets the table-memory budget in MB
    (0 / unset = off — table builds cost tens of seconds at 2^18+ and
    the win is per-PROVE, so the toggle belongs to long-lived provers:
    bench, server, C-API handles).  Disabled under a mesh (the sharded
    MSM path has its own layout).
    """
    import os
    budget = float(os.environ.get("ULTRAGROTH_FIXED_MSM_MB", "0")) * 1e6
    if budget <= 0 or mesh is not None:
        return {}
    plan = []
    for name, (grp, pts) in named_points.items():
        n = pts[2].shape[0]
        npad = max(64, 1 << (n - 1).bit_length())
        c = dmsm.default_fixed_window(npad)
        w = dmsm.fixed_n_windows(c)
        per_pt = 128 if grp == "g1" else 256
        plan.append((w * npad * per_pt, name, grp, pts, c))
    out = {}
    spend = 0
    for bytes_, name, grp, pts, c in sorted(plan, reverse=True,
                                            key=lambda t: t[0]):
        if spend + bytes_ > budget:
            continue
        packed, infp, c = dmsm.msm_fixed_table(grp, pts[0], pts[1],
                                               pts[2], c=c)
        out[name] = (packed, infp, c)
        spend += bytes_
    return out


class JaxGroth16Prover:
    """Keeps the zkey resident on device; prove() per witness.

    Mirrors the create/prove/destroy amortization contract of the C API
    (src/prover.cpp:449-579): zkey parse + limb repack + twiddle tables are
    paid once.

    mesh: optional jax.sharding.Mesh — when given, the five MSMs run
    data-parallel across `mesh[axis]` (parallel/msm.py) and the quotient's
    six NTT passes run as 4-step mesh NTTs (parallel/ntt.py).  This is the
    scaling dimension the single-node reference lacks (SURVEY.md §2.12).
    """

    def __init__(self, zkey, mesh=None, axis="data"):
        self.zk = zkey
        zk = zkey
        self.mesh = mesh
        self.axis = axis
        self.log_n = zk.domain_size.bit_length() - 1
        assert (1 << self.log_n) == zk.domain_size
        FR = fr()

        self.points_a = g1_section_to_planes(zk.points_a)
        self.points_b1 = g1_section_to_planes(zk.points_b1)
        self.points_b2 = g2_section_to_planes(zk.points_b2)
        self.points_c = g1_section_to_planes(zk.points_c)
        self.points_h = g1_section_to_planes(zk.points_h)
        self.coef_val_mont = lb.words_to_planes(zk.coef_val)  # already Mont
        self.coef_m = np.asarray(zk.coef_m, np.int32)
        self.coef_c = np.asarray(zk.coef_c, np.int32)
        self.coef_s = np.asarray(zk.coef_s, np.int32)

        # blinding-term points for the host-side finalization
        self.alpha1 = decode_g1(zk.alpha1)
        self.beta1 = decode_g1(zk.beta1)
        self.beta2 = decode_g2(zk.beta2)
        self.delta1 = decode_g1(zk.delta1)
        self.delta2 = decode_g2(zk.delta2)

        self.c_vars = dmsm.default_window(zk.n_vars)
        self.c_h = dmsm.default_window(zk.domain_size)
        self.fixed = _build_fixed_tables(
            self.mesh, a=("g1", self.points_a), b1=("g1", self.points_b1),
            b2=("g2", self.points_b2), c=("g1", self.points_c),
            h=("g1", self.points_h))

    # -- mesh-dispatching compute phases ------------------------------------
    def _msm_g1(self, pts, scalars, c: int, key: str | None = None):
        if key is not None and key in self.fixed:
            packed, infp, cf = self.fixed[key]
            return dmsm.msm_g1_fixed(packed, infp, scalars, cf)
        if self.mesh is None:
            return dmsm.msm_g1(*pts, scalars, c=c)
        from ..parallel.msm import msm_g1_sharded
        return msm_g1_sharded(*pts, scalars, self.mesh, self.axis, c=c)

    def _msm_g2(self, pts, scalars, c: int, key: str | None = None):
        if key is not None and key in self.fixed:
            packed, infp, cf = self.fixed[key]
            return dmsm.msm_g2_fixed(packed, infp, scalars, cf)
        if self.mesh is None:
            return dmsm.msm_g2(*pts, scalars, c=c)
        from ..parallel.msm import msm_g2_sharded
        return msm_g2_sharded(*pts, scalars, self.mesh, self.axis, c=c)

    def _quotient(self, a, b):
        if self.mesh is None:
            return dntt.quotient_scalars(a, b, self.log_n)
        from ..parallel.ntt import quotient_scalars_sharded
        return quotient_scalars_sharded(a, b, self.log_n, self.mesh,
                                        self.axis)

    def msm_outputs(self, witness_words: np.ndarray, tracer=None):
        """The five MSM results as device xyzz points (for tests/bench).

        tracer: optional trace.Tracer; phase names mirror the reference's
        per-phase prints (src/ultra_groth.cpp:199-239 structure)."""
        from ..trace import Tracer
        t = tracer or Tracer(enabled=False)
        zk = self.zk
        FR = fr()
        # upload the compact [N, 8] wire form and limb-split on device:
        # half the H2D bytes of host-side words_to_planes (verdict item 7)
        w_std = t.run("upload", lambda: lb.words_to_planes_device(
            witness_words))
        w_mont = FR.to_mont(w_std)

        pi_a = t.run("msm_a", lambda: self._msm_g1(
            self.points_a, w_std, c=self.c_vars, key="a"))
        pi_b1 = t.run("msm_b1", lambda: self._msm_g1(
            self.points_b1, w_std, c=self.c_vars, key="b1"))
        pi_b2 = t.run("msm_b2", lambda: self._msm_g2(
            self.points_b2, w_std, c=self.c_vars, key="b2"))
        pi_c = t.run("msm_c", lambda: self._msm_g1(
            self.points_c, w_std[:, zk.n_public + 1:], c=self.c_vars,
            key="c"))

        a, b = t.run("scatter", lambda: dntt.scatter_coefs(
            w_mont, self.coef_val_mont, self.coef_m, self.coef_c,
            self.coef_s, zk.domain_size))
        h_std = t.run("quotient", lambda: self._quotient(a, b))
        pi_h = t.run("msm_h", lambda: self._msm_g1(
            self.points_h, h_std, c=self.c_h, key="h"))
        return pi_a, pi_b1, pi_b2, pi_c, pi_h

    last_phase_ms: dict | None = None

    def prove(self, witness_words: np.ndarray, r: int | None = None,
              s: int | None = None, abort_check=None) -> Proof:
        """abort_check: optional callable polled between phases; raises
        trace.ProveAborted when it returns True (cooperative cancel)."""
        zk = self.zk
        if witness_words.shape[0] != zk.n_vars:
            raise ValueError("Invalid witness length.")
        r = random_blinding() if r is None else r
        s = random_blinding() if s is None else s
        from ..trace import Tracer, profile_session
        t = Tracer(label="groth16-prove", abort_check=abort_check)
        with profile_session("groth16-prove"):
            pi_a, pi_b1, pi_b2, pi_c, pi_h = self.msm_outputs(
                witness_words, t)
            (a, b1, c_, h), b2 = _oracle_points((pi_a, pi_b1, pi_c, pi_h),
                                                pi_b2)
            proof = finalize_proof(self, a, b1, b2, c_, h, r, s)
            t.mark("finalize")
        self.last_phase_ms = t.report()
        return proof


class JaxUltraGrothProver:
    """Device twin of OracleUltraGrothProver (2-round lookup prover).

    Heavy phases (5 MSMs + quotient NTTs + batched lookup inversion) run on
    device; the Fiat-Shamir keccak and O(1) blinding algebra stay on host,
    mirroring the reference's structure (src/ultra_groth.cpp:401-462).  The
    serial per-entry inversion loop of the reference (:72-79) becomes one
    batched Fermat inversion chain.

    mesh/axis: same multi-chip contract as JaxGroth16Prover.
    """

    _msm_g1 = JaxGroth16Prover._msm_g1
    _msm_g2 = JaxGroth16Prover._msm_g2
    _quotient = JaxGroth16Prover._quotient

    def __init__(self, zkey, mesh=None, axis="data"):
        from .ultragroth import derive_challenge, finalize_ultragroth
        from .groth16 import random_blinding
        self.zk = zkey
        zk = zkey
        self.mesh = mesh
        self.axis = axis
        self.log_n = zk.domain_size.bit_length() - 1
        assert (1 << self.log_n) == zk.domain_size

        self.points_a = g1_section_to_planes(zk.points_a)
        self.points_b1 = g1_section_to_planes(zk.points_b1)
        self.points_b2 = g2_section_to_planes(zk.points_b2)
        self.round_points_c = g1_section_to_planes(zk.round_points_c)
        self.final_points_c = g1_section_to_planes(zk.final_points_c)
        self.points_h = g1_section_to_planes(zk.points_h)
        self.coef_val_mont = lb.words_to_planes(zk.coef_val)
        self.coef_m = np.asarray(zk.coef_m, np.int32)
        self.coef_c = np.asarray(zk.coef_c, np.int32)
        self.coef_s = np.asarray(zk.coef_s, np.int32)
        self.round_indexes = np.asarray(zk.round_indexes, np.int32)
        self.final_indexes = np.asarray(zk.final_indexes, np.int32)

        self.alpha1 = decode_g1(zk.alpha1)
        self.beta1 = decode_g1(zk.beta1)
        self.beta2 = decode_g2(zk.beta2)
        self.round_delta1 = decode_g1(zk.round_delta1)
        self.final_delta1 = decode_g1(zk.final_delta1)
        self.final_delta2 = decode_g2(zk.final_delta2)

        self.c_vars = dmsm.default_window(zk.n_vars)
        self.c_h = dmsm.default_window(zk.domain_size)
        self.fixed = _build_fixed_tables(
            self.mesh, a=("g1", self.points_a), b1=("g1", self.points_b1),
            b2=("g2", self.points_b2), rc=("g1", self.round_points_c),
            fc=("g1", self.final_points_c), h=("g1", self.points_h))

    @staticmethod
    def _lookup_scatter(w_std, chunks, freqs, wtns_indxs, push_indxs,
                        rand: int):
        """Batched compute_lookup (parity: src/ultra_groth.cpp:61-106).

        All O(T) math runs on device: the reference's serial per-entry
        inversion loop (:72-79) becomes (i + rand) built from a vectorized
        iota, one batched Fermat inversion, and one batched product.  The
        only host bigint work is the O(1) rand scalar."""
        import jax.numpy as jnp
        FR = fr()
        T = len(freqs)
        idx_std = jnp.asarray(lb.u32_to_planes(np.arange(T, dtype=np.uint32)))
        rand_planes = jnp.asarray(lb.ints_to_planes([rand]))   # O(1) host
        table_std = FR.add(idx_std, rand_planes)      # (i + rand) mod r
        inv2_m = FR.inv_mont(FR.to_mont(table_std))   # Montgomery domain
        freqs_m = FR.to_mont(jnp.asarray(
            lb.u32_to_planes(np.asarray(freqs, np.uint32))))
        prod_std = FR.from_mont(FR.mont_mul(freqs_m, inv2_m))
        # mont_mul(mont, mont) -> mont; one more from_mont each
        inv2_std = FR.from_mont(inv2_m)
        inv1_std = inv2_std[:, np.asarray(chunks, np.int32)]
        push = jnp.concatenate(
            [rand_planes, inv1_std, inv2_std, prod_std], axis=1)
        vals = push[:, np.asarray(push_indxs, np.int32)]
        return jnp.asarray(w_std).at[:, np.asarray(wtns_indxs, np.int32)].set(vals)

    def prove(self, witness_words: np.ndarray, lookup, r0=None, r=None,
              s=None, abort_check=None):
        from ..trace import profile_session
        with profile_session("ultragroth-prove"):
            return self._prove(witness_words, lookup, r0, r, s, abort_check)

    def _prove(self, witness_words, lookup, r0, r, s, abort_check):
        from .groth16 import random_blinding
        from .ultragroth import derive_challenge, finalize_ultragroth
        from ..oracle import curve as oc
        zk = self.zk
        if witness_words.shape[0] != zk.n_vars:
            raise ValueError("Invalid witness length.")
        r0 = random_blinding() if r0 is None else r0
        r = random_blinding() if r is None else r
        s = random_blinding() if s is None else s
        from ..trace import Tracer
        t = Tracer(label="ultragroth-prove", abort_check=abort_check)

        w_std = lb.words_to_planes_device(witness_words)

        # round 0: commitment over the challenge-independent slice
        def round0():
            d_dev = self._msm_g1(
                self.round_points_c, w_std[:, self.round_indexes],
                c=dmsm.default_window(len(self.round_indexes)), key="rc")
            d = xyzz_to_oracle_g1(d_dev)
            return oc.g1_add(d, oc.g1_mul(self.final_delta1, r0))

        d = t.run("round0_commit", round0)
        rand = derive_challenge(d)

        w_std = t.run("lookup", lambda: self._lookup_scatter(
            w_std, lookup.chunks, lookup.frequencies, lookup.wtns_indxs,
            lookup.push_indxs, rand))
        FR = fr()
        w_mont = FR.to_mont(w_std)

        pi_a = t.run("msm_a", lambda: self._msm_g1(
            self.points_a, w_std, c=self.c_vars, key="a"))
        pi_b1 = t.run("msm_b1", lambda: self._msm_g1(
            self.points_b1, w_std, c=self.c_vars, key="b1"))
        pi_b2 = t.run("msm_b2", lambda: self._msm_g2(
            self.points_b2, w_std, c=self.c_vars, key="b2"))
        pi_c = t.run("msm_c", lambda: self._msm_g1(
            self.final_points_c, w_std[:, self.final_indexes],
            c=dmsm.default_window(len(self.final_indexes)), key="fc"))

        a, b = t.run("scatter", lambda: dntt.scatter_coefs(
            w_mont, self.coef_val_mont, self.coef_m, self.coef_c,
            self.coef_s, zk.domain_size))
        h_std = t.run("quotient", lambda: self._quotient(a, b))
        pi_h = t.run("msm_h", lambda: self._msm_g1(
            self.points_h, h_std, c=self.c_h, key="h"))

        (a_, b1_, c_, h_), b2_ = _oracle_points((pi_a, pi_b1, pi_c, pi_h),
                                                pi_b2)
        proof = finalize_ultragroth(self, a_, b1_, b2_, c_, h_, d, r0, r, s)
        t.mark("finalize")
        self.last_phase_ms = t.report()
        # return final witness values for public-signal extraction
        from ..ops import limbs as _lb
        w_final = _lb.planes_to_ints(np.asarray(w_std))
        return proof, w_final
