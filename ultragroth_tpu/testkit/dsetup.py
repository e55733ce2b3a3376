"""Device-side trusted setup: batched fixed-base muls + device Lagrange.

The host setup (testkit/setup.py) runs O(N) Python big-int math — ~64 s at
2^14 constraints and hours at 2^18+, which made every circuit beyond 2^14
unmeasurable (round-1 verdict item 2).  This twin produces BIT-IDENTICAL
zkey bytes (same RNG draw order, same section layout) with all O(N) work on
device:

  * Lagrange / coset-Lagrange evaluations at tau: one batched Fermat
    inversion + batched Montgomery muls over the whole domain;
  * per-variable polynomial evaluations A_i/B_i/C_i(tau): segment_sum over
    the R1CS coefficient records (same lazy-limb trick as
    ops/ntt.scatter_coefs);
  * every zkey curve point: batched 8-bit-window fixed-base multiplication
    — ONE gather + fused complete-madd per window (32 steps total for any
    batch size), then one batched to_affine inversion.

The only remaining host loops are O(1) (toxic waste, vk points) or pure
byte-shuffling (vectorized wire encode via ops/limbs.planes_to_words).

No reference counterpart exists (the reference ships no setup tool); the
section maps follow /root/reference/src/zkey_utils.cpp:123-163 via the
shared helpers in testkit/setup.py.
"""
from __future__ import annotations

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..constants import FR_MODULUS as R, FQ_MODULUS as Q, MONT_R
from ..io.binfile import pack_binfile
from ..ops import kernels
from ..ops import limbs as lb
from ..ops.curve import g1_ops, g2_ops
from ..ops.field import fr
from ..ops.msm import _pack_points_planes, _unpack_cols
from ..ops.ntt import _powers
from ..protocol.transcript import root_of_unity
from .setup import (R1CS, SetupResult, UltraSetupResult, _FixedBase,
                    _domain_size, _enc_g1, _enc_g2, _groth_header_blob)

L = lb.NLIMBS
FR = fr()


# ---------------------------------------------------------------------------
# fixed-base tables (host-built once per group, oracle math; ~16K adds)
# ---------------------------------------------------------------------------

@functools.cache
def _fb_oracle(group: str) -> _FixedBase:
    from ..oracle import curve as oc
    if group == "g1":
        return _FixedBase(oc.G1, oc.g1_add)
    return _FixedBase(oc.G2, oc.g2_add)


def _mont_planes_fq(vals) -> np.ndarray:
    """list of ints -> [L, N] Montgomery-form Fq limb planes (host)."""
    return lb.ints_to_planes([v * MONT_R % Q for v in vals])


@functools.cache
def _fb_table_packed(group: str) -> np.ndarray:
    """The 32x256 window table as one plane-major packed array
    ([K*L+1, 8192], Montgomery affine + infinity flags at d == 0)."""
    fb = _fb_oracle(group)
    pts = [p for row in fb.tables for p in row]          # w-major, d minor
    inf = np.array([p is None for p in pts])
    if group == "g1":
        x = _mont_planes_fq([0 if p is None else p[0] for p in pts])
        y = _mont_planes_fq([0 if p is None else p[1] for p in pts])
    else:
        x = tuple(_mont_planes_fq([0 if p is None else p[0][i] for p in pts])
                  for i in range(2))
        y = tuple(_mont_planes_fq([0 if p is None else p[1][i] for p in pts])
                  for i in range(2))
    # coordinate planes + an infinity-flag row (the MSM's packer dropped
    # its flag row when the digit stage took over infinity handling; the
    # fixed-base table keeps one because d == 0 entries ARE infinity)
    packed = np.asarray(_pack_points_planes(x, y))
    return np.concatenate([packed, inf[None].astype(np.uint32)], axis=0)


@functools.partial(jax.jit, static_argnames=("group",))
def _fb_run(packed, scalars_std, group: str):
    """Batched fixed-base mul: scalars [L, N] standard form -> Montgomery
    affine (x, y, inf); 32 gather+madd steps regardless of N."""
    ops = g1_ops() if group == "g1" else g2_ops()
    madd = kernels.curve_madd_valid(group)
    n = scalars_std.shape[-1]
    if group == "g1":
        x_like = y_like = jnp.zeros((L, 1), jnp.uint32)
    else:
        x_like = y_like = (jnp.zeros((L, 1), jnp.uint32),) * 2
    digits = jnp.stack([(scalars_std[w // 2] >> ((w % 2) * 8)) & 0xFF
                        for w in range(32)])             # [32, N]
    offs = jnp.arange(32, dtype=jnp.uint32) * 256

    def body(acc, xs):
        off, d = xs
        idx = (off + d).astype(jnp.int32)
        cols = packed[:, idx]
        gx, gy = _unpack_cols(cols[:-1], x_like, y_like)
        ginf = cols[-1] != 0
        return madd(acc, gx, gy, ginf), None

    acc, _ = jax.lax.scan(body, ops.inf_xyzz((n,)), (offs, digits))
    # under lazy reduction the madd kernel emits [0, 2p) representatives;
    # the ROLLED to_affine below (inv_mont's mont_mul assumes b < p) needs
    # canonical inputs — same exit-boundary rule as ops/msm._msm
    from ..ops.msm import _lazy_kernels
    if _lazy_kernels():
        from ..ops.field import fq
        acc = jax.tree_util.tree_map(lambda t: fq().canon(t), acc)
    return ops.to_affine(acc)


def _fixed_base_points(group: str, scalars_std):
    packed = jnp.asarray(_fb_table_packed(group))
    return _fb_run(packed, jnp.asarray(scalars_std), group)


# ---------------------------------------------------------------------------
# wire encode (vectorized twin of setup._enc_g1/_enc_g2 section loops)
# ---------------------------------------------------------------------------

def _g1_section_bytes(aff) -> bytes:
    x, y, inf = aff
    words = np.stack([lb.planes_to_words(np.asarray(x)),
                      lb.planes_to_words(np.asarray(y))], axis=1)  # [N, 2, 8]
    words[np.asarray(inf)] = 0
    return words.astype("<u4").tobytes()


def _g2_section_bytes(aff) -> bytes:
    x, y, inf = aff
    words = np.stack([lb.planes_to_words(np.asarray(c))
                      for c in (x[0], x[1], y[0], y[1])], axis=1)  # [N, 4, 8]
    words[np.asarray(inf)] = 0
    return words.astype("<u4").tobytes()


def _coefs_blob_fast(rows) -> bytes:
    """Vectorized section-4 writer (byte-identical to setup._coefs_blob)."""
    m_l, c_l, s_l, v_l = [], [], [], []
    for c, (a, b, _) in enumerate(rows):
        for s, v in a.items():
            m_l.append(0); c_l.append(c); s_l.append(s); v_l.append(v % R)
        for s, v in b.items():
            m_l.append(1); c_l.append(c); s_l.append(s); v_l.append(v % R)
    mont_cache: dict = {}
    for v in v_l:
        if v not in mont_cache:
            mont_cache[v] = v * MONT_R % R
    words = lb.planes_to_words(
        lb.ints_to_planes([mont_cache[v] for v in v_l]))   # [nrec, 8]
    rec = np.empty((len(m_l), 11), dtype="<u4")
    rec[:, 0] = m_l
    rec[:, 1] = c_l
    rec[:, 2] = s_l
    rec[:, 3:] = words
    return len(m_l).to_bytes(4, "little") + rec.tobytes()


# ---------------------------------------------------------------------------
# device scalar pipeline
# ---------------------------------------------------------------------------

def _lagrange_mont(tau: int, n: int, log_n: int, coset: bool):
    """[L, n] Montgomery planes of L_c(tau) (standard domain) or Lc_j(tau)
    (odd coset) — the device twin of setup._lagrange_at_tau /
    _coset_lagrange_at_tau."""
    w = root_of_unity(log_n)
    s0 = root_of_unity(log_n + 1) if coset else 1
    s0n = pow(s0, n, R)
    zt = (pow(tau, n, R) - s0n) % R
    k = zt * pow(n * s0n % R, -1, R) % R          # zt / (n * s0^n)
    mul = FR.mont_mul
    xc = mul(_powers(FR, w, n), FR.to_mont(FR.const(s0, (1,))))  # s0 * w^c
    inv = FR.inv_mont(FR.sub(FR.to_mont(FR.const(tau, (1,))), xc))
    return mul(mul(xc, inv), FR.to_mont(FR.const(k, (1,))))


def _segment_sum_mont(values_m, seg, num: int, chunk: int = 1 << 16):
    """Montgomery-domain segment sum: [L, M] values -> [L, num]."""
    acc = FR.zero((num,))
    m = values_m.shape[-1]
    for start in range(0, m, chunk):
        end = min(start + chunk, m)
        sums = jax.ops.segment_sum(values_m[:, start:end].T, seg[start:end],
                                   num_segments=num)
        acc = FR.add(acc, FR.redc_carry(sums.T))
    return acc


def _poly_evals_device(rows, n_vars: int, lag_m):
    """a_t, b_t, c_t [L, n_vars] Montgomery planes via one segment_sum."""
    m_l, c_l, s_l, v_l = [], [], [], []
    for c, row in enumerate(rows):
        for which in range(3):
            for s, v in row[which].items():
                m_l.append(which); c_l.append(c); s_l.append(s)
                v_l.append(v % R)
    mont_cache: dict = {}
    for v in v_l:
        if v not in mont_cache:
            mont_cache[v] = v * MONT_R % R
    v_m = jnp.asarray(lb.ints_to_planes([mont_cache[v] for v in v_l]))
    c_arr = np.asarray(c_l, np.int32)
    seg = (np.asarray(m_l, np.int64) * n_vars
           + np.asarray(s_l, np.int64)).astype(np.int32)
    prod = FR.mont_mul(v_m, lag_m[:, c_arr])
    out = _segment_sum_mont(prod, jnp.asarray(seg), 3 * n_vars)
    return out[:, :n_vars], out[:, n_vars:2 * n_vars], out[:, 2 * n_vars:]


def _scaled_std(vals_m, scale: int):
    """from_mont(vals * scale): -> standard-form planes for fixed-base."""
    return FR.from_mont(FR.mont_mul(
        vals_m, FR.to_mont(FR.const(scale, (1,)))))


def _device_common(r1cs: R1CS, rng: random.Random):
    """Mirror of setup._common with device math; same RNG draw order."""
    n = _domain_size(len(r1cs.rows))
    log_n = n.bit_length() - 1
    tau = rng.randrange(1, R)
    alpha = rng.randrange(1, R)
    beta = rng.randrange(1, R)
    gamma = rng.randrange(1, R)
    lag_m = _lagrange_mont(tau, n, log_n, coset=False)
    a_m, b_m, c_m = _poly_evals_device(r1cs.rows, r1cs.n_vars, lag_m)
    k_m = FR.add(FR.add(FR.mont_mul(a_m, FR.to_mont(FR.const(beta, (1,)))),
                        FR.mont_mul(b_m, FR.to_mont(FR.const(alpha, (1,))))),
                 c_m)
    return n, log_n, tau, alpha, beta, gamma, a_m, b_m, k_m


def _h_scalars_std(tau: int, n: int, log_n: int, delta: int):
    """Lc_j(tau) * (tau^n - 1) * R^2 / (-2 delta): setup._h_points scalars
    (the coset vanishing factor lives inside _lagrange_mont's K)."""
    lc_m = _lagrange_mont(tau, n, log_n, coset=True)
    zt = (pow(tau, n, R) - 1) % R
    scale = zt * MONT_R % R * MONT_R % R * pow(-2 * delta % R, -1, R) % R
    return _scaled_std(lc_m, scale)


def groth16_setup_fast(r1cs: R1CS, seed: int = 0) -> SetupResult:
    """Protocol-1 zkey, bit-identical to setup.groth16_setup(r1cs, seed)."""
    rng = random.Random(seed)
    n, log_n, tau, alpha, beta, gamma, a_m, b_m, k_m = _device_common(r1cs, rng)
    delta = rng.randrange(1, R)
    np_pub = r1cs.n_public

    g1 = _fb_oracle("g1")

    ic_aff = _fixed_base_points(
        "g1", _scaled_std(k_m[:, :np_pub + 1], pow(gamma, -1, R)))
    a_aff = _fixed_base_points("g1", FR.from_mont(a_m))
    b1_aff = _fixed_base_points("g1", FR.from_mont(b_m))
    b2_aff = _fixed_base_points("g2", FR.from_mont(b_m))
    c_aff = _fixed_base_points(
        "g1", _scaled_std(k_m[:, np_pub + 1:], pow(delta, -1, R)))
    h_aff = _fixed_base_points("g1", _h_scalars_std(tau, n, log_n, delta))

    g2t = _fb_oracle("g2")
    alpha1, beta1 = g1.mul(alpha), g1.mul(beta)
    beta2, gamma2 = g2t.mul(beta), g2t.mul(gamma)
    delta1, delta2 = g1.mul(delta), g2t.mul(delta)

    hdr = _groth_header_blob(Q, R, r1cs.n_vars, np_pub, n)
    hdr += _enc_g1(alpha1) + _enc_g1(beta1) + _enc_g2(beta2)
    hdr += _enc_g2(gamma2) + _enc_g1(delta1) + _enc_g2(delta2)

    sections = [
        (C.ZKEY_SEC_HEADER, C.GROTH16_PROTOCOL_ID.to_bytes(4, "little")),
        (C.ZKEY_SEC_GROTH_HEADER, bytes(hdr)),
        (C.ZKEY_SEC_IC, _g1_section_bytes(ic_aff)),
        (C.ZKEY_SEC_COEFS, _coefs_blob_fast(r1cs.rows)),
        (C.ZKEY_SEC_POINTS_A, _g1_section_bytes(a_aff)),
        (C.ZKEY_SEC_POINTS_B1, _g1_section_bytes(b1_aff)),
        (C.ZKEY_SEC_POINTS_B2, _g2_section_bytes(b2_aff)),
        (C.ZKEY_SEC_POINTS_C, _g1_section_bytes(c_aff)),
        (C.ZKEY_SEC_POINTS_H, _g1_section_bytes(h_aff)),
    ]
    from ..protocol.transcript import g1_to_json, g2_to_json
    ic_json = _affine_json_g1(ic_aff)
    vk = {
        "protocol": "groth16", "curve": "bn128", "nPublic": np_pub,
        "vk_alpha_1": g1_to_json(alpha1), "vk_beta_2": g2_to_json(beta2),
        "vk_gamma_2": g2_to_json(gamma2), "vk_delta_2": g2_to_json(delta2),
        "IC": ic_json,
    }
    return SetupResult(
        zkey_bytes=pack_binfile(C.ZKEY_MAGIC, 1, sections), vk_json=vk,
        taus=dict(tau=tau, alpha=alpha, beta=beta, gamma=gamma, delta=delta))


def _affine_json_g1(aff):
    """Montgomery affine planes -> snarkjs-style IC json list."""
    from ..protocol.transcript import g1_to_json
    x, y, inf = aff
    FQ = g1_ops().F
    xs = lb.planes_to_ints(np.asarray(FQ.from_mont(jnp.asarray(x))))
    ys = lb.planes_to_ints(np.asarray(FQ.from_mont(jnp.asarray(y))))
    infs = np.asarray(inf)
    return [g1_to_json(None if infs[i] else (xs[i], ys[i]))
            for i in range(len(xs))]


def ultragroth_setup_fast(r1cs: R1CS, round_indexes, final_indexes,
                          rand_indx: int, seed: int = 0) -> UltraSetupResult:
    """Protocol-1337 zkey, bit-identical to setup.ultragroth_setup."""
    rng = random.Random(seed)
    n, log_n, tau, alpha, beta, gamma, a_m, b_m, k_m = _device_common(r1cs, rng)
    delta_r = rng.randrange(1, R)
    delta_f = rng.randrange(1, R)
    np_pub = r1cs.n_public

    ginv = pow(gamma, -1, R)
    keep = [i for i in range(np_pub + 1) if i != rand_indx]
    ic_aff = _fixed_base_points(
        "g1", _scaled_std(k_m[:, np.asarray(keep, np.int32)], ginv))
    icr_aff = _fixed_base_points(
        "g1", _scaled_std(k_m[:, rand_indx:rand_indx + 1], ginv))

    a_aff = _fixed_base_points("g1", FR.from_mont(a_m))
    b1_aff = _fixed_base_points("g1", FR.from_mont(b_m))
    b2_aff = _fixed_base_points("g2", FR.from_mont(b_m))
    ri = np.asarray(round_indexes, np.int32)
    fi = np.asarray(final_indexes, np.int32)
    rc_aff = _fixed_base_points(
        "g1", _scaled_std(k_m[:, ri], pow(delta_r, -1, R)))
    fc_aff = _fixed_base_points(
        "g1", _scaled_std(k_m[:, fi], pow(delta_f, -1, R)))
    h_aff = _fixed_base_points("g1", _h_scalars_std(tau, n, log_n, delta_f))

    g1t, g2t = _fb_oracle("g1"), _fb_oracle("g2")
    alpha1, beta1 = g1t.mul(alpha), g1t.mul(beta)
    beta2, gamma2 = g2t.mul(beta), g2t.mul(gamma)
    rd1, rd2 = g1t.mul(delta_r), g2t.mul(delta_r)
    fd1, fd2 = g1t.mul(delta_f), g2t.mul(delta_f)

    extra = (len(round_indexes).to_bytes(4, "little")
             + len(final_indexes).to_bytes(4, "little")
             + rand_indx.to_bytes(4, "little"))
    hdr = _groth_header_blob(Q, R, r1cs.n_vars, np_pub, n, extra)
    hdr += _enc_g1(alpha1) + _enc_g1(beta1) + _enc_g2(beta2) + _enc_g2(gamma2)
    hdr += _enc_g1(rd1) + _enc_g2(rd2) + _enc_g1(fd1) + _enc_g2(fd2)

    idx_blob = lambda idxs: np.asarray(idxs, dtype="<u4").tobytes()
    sections = [
        (C.ZKEY_SEC_HEADER, C.ULTRAGROTH_PROTOCOL_ID.to_bytes(4, "little")),
        (C.ZKEY_SEC_GROTH_HEADER, bytes(hdr)),
        (C.ZKEY_SEC_IC, _g1_section_bytes(ic_aff)),
        (C.ZKEY_SEC_COEFS, _coefs_blob_fast(r1cs.rows)),
        (C.ZKEY_SEC_POINTS_A, _g1_section_bytes(a_aff)),
        (C.ZKEY_SEC_POINTS_B1, _g1_section_bytes(b1_aff)),
        (C.ZKEY_SEC_POINTS_B2, _g2_section_bytes(b2_aff)),
        (C.UG_SEC_ROUND_POINTS_C, _g1_section_bytes(rc_aff)),
        (C.UG_SEC_FINAL_POINTS_C, _g1_section_bytes(fc_aff)),
        (C.UG_SEC_ROUND_INDEXES, idx_blob(round_indexes)),
        (C.UG_SEC_FINAL_INDEXES, idx_blob(final_indexes)),
        (C.UG_SEC_POINTS_H, _g1_section_bytes(h_aff)),
    ]
    from ..protocol.transcript import g1_to_json, g2_to_json
    vk = {
        "protocol": "ultragroth", "curve": "bn128",
        "vk_alpha_1": g1_to_json(alpha1), "vk_beta_2": g2_to_json(beta2),
        "vk_gamma_2": g2_to_json(gamma2),
        "vk_delta_c2_2": g2_to_json(fd2), "vk_delta_c1_2": g2_to_json(rd2),
        "IC": _affine_json_g1(ic_aff),
        "IC_rand": _affine_json_g1(icr_aff)[0],
        "randIdx": rand_indx,
    }
    return UltraSetupResult(
        zkey_bytes=pack_binfile(C.ZKEY_MAGIC, 1, sections), vk_json=vk,
        taus=dict(tau=tau, alpha=alpha, beta=beta, gamma=gamma,
                  delta_r=delta_r, delta_f=delta_f))
