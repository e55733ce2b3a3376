"""Batched prime-field arithmetic on 16-bit limb planes (JAX, TPU-first).

Replaces the reference's scalar Montgomery assembly (Fr_rawMMul CIOS loop,
/root/reference/build/fr_raw_generic.cpp:107-148) with lane-parallel CIOS
over uint32 limb planes: every op processes an entire batch of field
elements on the VPU; all carries are exact in uint32 because limbs are
16-bit.

Layout: [NLIMBS, *batch] uint32 (see ops/limbs.py).  Montgomery radix
R = 2^256, matching the zkey wire format, so Montgomery-form wire data needs
no re-encoding.

Graph-size discipline (matters for XLA compile time as much as for TPU
scheduling): carry chains run as log-depth carry-lookahead via
`associative_scan`, the CIOS outer loop is a `lax.scan` traced once, and the
inner products are whole-limb-plane vector ops in a redundant (carry-save)
accumulator - a mont_mul traces to ~100 XLA ops instead of ~2500 for the
naive unrolled form.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FQ_MODULUS, FR_MODULUS
from .limbs import LIMB_BITS, LIMB_MASK, NLIMBS, int_to_limbs

L = NLIMBS
MASK = LIMB_MASK
U32 = jnp.uint32


def lazy_enabled() -> bool:
    """ULTRAGROTH_LAZY (read at trace time; DEFAULT ON since round 4)
    switches the Fq kernel-mode field ops to LAZY REDUCTION: values live
    in [0, 2p) and mont_mul skips its canonicalizing conditional subtract
    (sound because 4p < R = 2^256 for BN254, so CIOS output
    (a*b + m*p)/R < 2p whenever a, b < 2p).  add/sub reduce against 2p
    instead of p and is_zero recognizes both residue-zero representatives
    {0, p}.  Fr kernels (the NTT path) are NOT affected — only the Fq/Fq2
    curve kernels, whose consumers canonicalize at every exit boundary
    back to rolled ops (ops/msm._msm, parallel/msm._fold_gathered,
    testkit/dsetup._fb_run).

    Measured on v5e (experiments/queue_r4a.log): full 2^18/c=13 G1 MSM
    993.7 ms lazy vs 1152.1 ms canonical (1.16x), affine output
    bit-identical.  Set ULTRAGROTH_LAZY=0 for canonical kernel-domain
    outputs (the raw-bit interpret parity tests pin this).

    Like ULTRAGROTH_MXU_FIELD, flip it before the first trace of a
    program: compiled programs keep whichever mode they were traced in."""
    return os.environ.get("ULTRAGROTH_LAZY", "1") == "1"


def _carry_chain(gen, prop):
    """Inclusive carry-lookahead over the leading (limb) axis.

    gen, prop: [L, *batch] uint32 in {0,1}.  Returns carry-in planes
    c[j] = carry entering limb j (c[0] = 0): the classic (g, p) semigroup
    scanned in log2(L) levels.
    """
    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pb & pa)

    g_inc, _ = jax.lax.associative_scan(combine, (gen, prop), axis=0)
    zero = jnp.zeros_like(g_inc[:1])
    return jnp.concatenate([zero, g_inc[:-1]], axis=0)


def _add_cla(a, b, unroll: bool = False):
    """Exact 256-bit add of canonical limb planes; carry-out discarded
    (callers guarantee a + b < 2^256).  unroll=True emits a flat ripple
    chain (Pallas kernels: associative_scan doesn't lower in Mosaic)."""
    if unroll:
        c = jnp.zeros(a.shape[1:], U32)
        out = []
        for j in range(L):
            s = a[j] + b[j] + c
            out.append(s & MASK)
            c = s >> LIMB_BITS
        return jnp.stack(out)
    s = a + b                      # <= 2^17 - 2
    low = s & MASK
    gen = s >> LIMB_BITS           # in {0,1}
    prop = (low == MASK).astype(U32)
    c = _carry_chain(gen, prop)
    return (low + c) & MASK


def _sub_cla(a, b, unroll: bool = False):
    """256-bit subtract: returns (diff planes, borrow-out plane in {0,1})."""
    if unroll:
        borrow = jnp.zeros(a.shape[1:], U32)
        out = []
        for j in range(L):
            d = a[j] - b[j] - borrow
            borrow = d >> 31
            out.append(d & MASK)
        return jnp.stack(out), borrow
    d = a - b                      # u32 wraparound
    gen = d >> 31                  # 1 where a_j < b_j
    low = d & MASK
    prop = (low == 0).astype(U32)
    c = _carry_chain(gen, prop)
    out = (low - c) & MASK
    # borrow-out = carry chain result at the top limb (inclusive)
    top = gen[L - 1] | (prop[L - 1] & c[L - 1])
    return out, top


class FieldOps:
    """Batched modular arithmetic for one prime field.

    All array arguments are uint32 limb planes [L, *batch]; values are kept
    in [0, p).  Montgomery-domain values (x*R mod p) use the same encoding;
    the caller tracks which domain an array is in (same discipline as the
    reference prover, src/groth16.cpp:100-148).

    Public ops are jit-wrapped per (cached, singleton) instance, so eager
    calls from host code are compiled too; calls inside an enclosing jit
    inline as usual.
    """

    def __init__(self, modulus: int, name: str):
        self.p = modulus
        self.name = name
        self.p_limbs = [int(x) for x in int_to_limbs(modulus)]
        self.p2_limbs = [int(x) for x in int_to_limbs(2 * modulus)]
        self.p_planes = np.asarray(int_to_limbs(modulus), np.uint32).reshape(L, 1)
        self.ninv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.r = (1 << 256) % modulus
        self.r2 = (self.r * self.r) % modulus
        self.r_inv = pow(self.r, -1, modulus)
        # Static MSB-first bit table for Fermat inversion: exponent p - 2.
        e = modulus - 2
        self._inv_bits = np.array(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.uint32)
        for f in ("add", "sub", "neg", "half", "mont_mul", "mont_sqr",
                  "to_mont", "from_mont", "inv_mont", "redc_carry",
                  "batch_inv_mont"):
            setattr(self, f, jax.jit(getattr(self, "_" + f)))

    # -- constants ---------------------------------------------------------

    def const(self, value: int, batch_shape=()):  # standard-domain constant
        """Built from per-limb SCALAR literals (broadcast adds), never a
        materialized array - Pallas kernels reject captured array consts."""
        limbs = int_to_limbs(value % self.p)
        z = jnp.zeros(tuple(batch_shape), U32)
        return jnp.stack([z + int(v) for v in limbs])

    def zero(self, batch_shape=()):
        return jnp.zeros((L,) + tuple(batch_shape), dtype=U32)

    def one_mont(self, batch_shape=()):
        return self.const(self.r, batch_shape)

    def _p_bc(self, batch_shape):
        """The modulus itself as limb planes (NOT reduced mod p)."""
        z = jnp.zeros(tuple(batch_shape), U32)
        return jnp.stack([z + int(v) for v in self.p_limbs])

    def _p2_bc(self, batch_shape):
        """2p as limb planes (the lazy-domain reduction constant)."""
        z = jnp.zeros(tuple(batch_shape), U32)
        return jnp.stack([z + int(v) for v in self.p2_limbs])

    # -- comparison helpers ------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def _is_zero_lazy(self, a):
        """Residue-zero test for lazy-domain values in [0, 2p): the only
        representatives of 0 are 0 and p.  Per-limb scalar-literal
        compares (no captured const arrays — Pallas-safe)."""
        z = jnp.all(a == 0, axis=0)
        pp = a[0] == U32(self.p_limbs[0])
        for j in range(1, L):
            pp = pp & (a[j] == U32(self.p_limbs[j]))
        return z | pp

    def canon(self, a, unroll: bool = False):
        """Canonicalize a lazy-domain value in [0, 2p) to [0, p): one
        conditional subtract of p.  Identity on already-canonical
        values, so callers may apply it unconditionally at kernel-exit
        boundaries."""
        d, borrow = _sub_cla(a, self._p_bc(a.shape[1:]), unroll)
        return jnp.where((borrow == 0)[None], d, a)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    # -- modular add / sub / neg ------------------------------------------

    def _add(self, a, b, unroll: bool = False, lazy: bool = False):
        """lazy=True: inputs/outputs in [0, 2p) — reduce against 2p.
        a + b < 4p < 2^256, so the exact add never loses a carry."""
        a, b = jnp.broadcast_arrays(a, b)
        s = _add_cla(a, b, unroll)
        red = self._p2_bc(s.shape[1:]) if lazy else self._p_bc(s.shape[1:])
        d, borrow = _sub_cla(s, red, unroll)
        return jnp.where((borrow == 0)[None], d, s)

    def _sub(self, a, b, unroll: bool = False, lazy: bool = False):
        """lazy=True: a - b + 2p on borrow keeps the result in [0, 2p)
        for any a, b in [0, 2p) — including p-representatives of zero."""
        a, b = jnp.broadcast_arrays(a, b)
        d, borrow = _sub_cla(a, b, unroll)
        red = self._p2_bc(d.shape[1:]) if lazy else self._p_bc(d.shape[1:])
        fixed = _add_cla(d, red, unroll)
        return jnp.where((borrow != 0)[None], fixed, d)

    def _neg(self, a):
        return self._sub(self.zero(a.shape[1:]), a)

    def _half(self, a):
        """a/2 mod p: add p where odd, then exact shift right."""
        odd = a[0] & 1
        padd = _add_cla(a, jnp.where((odd != 0)[None], self._p_bc(a.shape[1:]),
                                     self.zero(a.shape[1:])))
        # (a + p) < 2^255 so no lost carry; shift right one bit across limbs
        hi = jnp.concatenate([padd[1:], jnp.zeros_like(padd[:1])], axis=0)
        return ((padd >> 1) | ((hi & 1) << (LIMB_BITS - 1))) & MASK

    # -- Montgomery multiplication (CIOS, carry-save) ----------------------

    def _mont_mul(self, a, b, unroll: bool = False, lazy: bool = False):
        """(a * b * R^-1) mod p, batched redundant-limb CIOS.

        lazy=True (kernel-mode lazy reduction): accepts a, b in [0, 2p)
        and returns a representative in [0, 2p) WITHOUT the canonicalizing
        conditional subtract — sound because 4p < R = 2^256 for BN254, so
        t = (a*b + m*p)/R < (4p^2 + Rp)/R < 2p.  Saves the final unrolled
        16-limb subtract + select per multiply (~25% of the kernel-mode
        mont_mul cost; PERF.md round-3 floor analysis).

        Per outer limb i: split the vector products a_i * b and m * p into
        16-bit halves and accumulate them carry-save into a redundant
        accumulator t (limbs grow to at most ~2^22 over 16 iterations - far
        inside uint32).  Only limb 0 is resolved each step (its value mod
        2^16 is exact by construction) to form the Montgomery quotient
        digit m and the exact right-shift carry.  One final ripple-carry
        pass + conditional subtract canonicalizes.

        unroll=False runs the outer loop as lax.fori_loop (small graph, the
        XLA path); unroll=True emits flat straight-line code - required
        inside Pallas kernels (Mosaic can't lower scan/fori bodies with
        per-step array slicing) and optimal there since everything lives in
        VMEM.

        Accepts any a < 2^256 when b < p (used by redc_carry), result < p.
        """
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def _bcast(x):
            bx = x.shape[1:]
            x = x.reshape((L,) + (1,) * (len(batch) - len(bx)) + bx)
            return jnp.broadcast_to(x, (L,) + batch)

        a, b = _bcast(a), _bcast(b)
        pl = self.p_limbs
        zrow = jnp.zeros((1,) + batch, U32)

        def step(ai, t):
            # t: [L+1, batch] redundant; value(t) invariant under carries
            prod = ai[None] * b                  # [L], exact u32
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            t = t.at[:L].add(lo)
            t = t.at[1:].add(hi)
            m = ((t[0] & MASK) * self.ninv) & MASK
            mp = jnp.stack([m * int(pj) for pj in pl])
            lo2 = mp & MASK
            hi2 = mp >> LIMB_BITS
            t = t.at[:L].add(lo2)
            t = t.at[1:].add(hi2)
            carry0 = t[0] >> LIMB_BITS           # t[0] === 0 mod 2^16 now
            t = jnp.concatenate([t[1:], zrow], axis=0)
            t = t.at[0].add(carry0)
            return t

        t0 = jnp.zeros((L + 1,) + batch, U32)
        if unroll:
            # flat straight-line form (lists of planes, no scatter/scan -
            # the only constructs Mosaic lowers inside kernels)
            zero = jnp.zeros(batch, U32)
            bl = [b[j] for j in range(L)]
            t = [zero] * (L + 1)
            for i in range(L):
                ai = a[i]
                for j in range(L):
                    pj = ai * bl[j]
                    t[j] = t[j] + (pj & MASK)
                    t[j + 1] = t[j + 1] + (pj >> LIMB_BITS)
                m = ((t[0] & MASK) * self.ninv) & MASK
                for j in range(L):
                    mp = m * int(pl[j])
                    t[j] = t[j] + (mp & MASK)
                    t[j + 1] = t[j + 1] + (mp >> LIMB_BITS)
                carry0 = t[0] >> LIMB_BITS
                t = t[1:] + [zero]
                t[0] = t[0] + carry0
            c = zero
            planes = []
            for j in range(L + 1):
                s = t[j] + c
                planes.append(s & MASK)
                c = s >> LIMB_BITS
            planes = jnp.stack(planes)
        else:
            t = jax.lax.fori_loop(
                0, L,
                lambda i, t: step(jax.lax.dynamic_index_in_dim(
                    a, i, 0, keepdims=False), t),
                t0)

            def ripple(c, limb):
                s = limb + c
                return s >> LIMB_BITS, s & MASK

            _, planes = jax.lax.scan(ripple, jnp.zeros(batch, U32), t)

        if lazy:
            # value < 2p < 2^255 when a, b < 2p: planes[L] == 0, the
            # 16 low planes ARE the lazy-domain representative
            return planes[:L]
        # value < 2p < 2^255: planes[L] in {0, 1}
        lo = planes[:L]
        d, borrow = _sub_cla(lo, self._p_bc(batch), unroll)
        use_sub = (planes[L] > 0) | (borrow == 0)
        return jnp.where(use_sub[None], d, lo)

    def _mont_sqr(self, a):
        return self._mont_mul(a, a)

    def _to_mont(self, a):
        return self._mont_mul(a, self.const(self.r2, ()))

    def _from_mont(self, a):
        return self._mont_mul(a, self.const(1, ()))

    # -- wide reduction (for lazily-accumulated sums) ----------------------

    def _redc_carry(self, wide):
        """Reduce a lazily-accumulated array mod p.

        `wide`: [L, *batch] uint32 limb planes holding an UN-normalized sum
        of at most 2^16 canonical elements (each plane <= 2^32 - 2^16, so
        the ripple carry stays exact in uint32).  Typical producer:
        `jax.ops.segment_sum` over Montgomery-form values.  Returns
        canonical planes of value mod p (same domain as the addends).
        """
        def ripple(c, limb):
            s = limb + c
            return s >> LIMB_BITS, s & MASK

        carry, planes = jax.lax.scan(ripple, jnp.zeros(wide.shape[1:], U32), wide)
        # value = planes + carry * 2^256, carry < 2^16
        lo_modp = self._from_mont(self._to_mont(planes))
        cp = jnp.concatenate([carry[None], jnp.zeros_like(wide[:L - 1])], axis=0)
        hi = self._to_mont(cp)   # carry * 2^256 mod p (R = 2^256)
        return self._add(lo_modp, hi)

    # -- inversion / exponentiation ---------------------------------------

    def _inv_mont(self, a):
        """Batched inverse in the Montgomery domain: inv(xR) = x^-1 R.

        Fermat: a^(p-2) with a scan over static exponent bits.  inv(0) = 0.
        Replaces the reference's serial mpz_invert path
        (/root/reference/build/fr.cpp:238-250) with a fully batched chain.
        """
        bits = jnp.asarray(self._inv_bits)

        def body(acc, bit):
            acc = self._mont_sqr(acc)
            acc = jnp.where(bit != 0, self._mont_mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, self.one_mont(a.shape[1:]), bits)
        return acc

    def _batch_inv_mont(self, a):
        """Montgomery-trick batched inversion (Montgomery domain): two
        O(log N) prefix-product sweeps + ONE Fermat inversion of the
        running total, then inv_i = excl_prefix_i * excl_suffix_i *
        total^-1.  inv(0) = 0 (zero lanes are masked to 1 for the sweeps
        so they can't zero the total).

        ~6N multiply-lanes instead of Fermat's ~1000N — the batched
        answer to the reference's serial per-element inversion loop
        (/root/reference/src/ultra_groth.cpp:72-79).  Rolled-ops only
        (associative_scan cannot live inside a Pallas kernel); intended
        for one-shot normalizations (fixed-base tables, lookup tables),
        not in-kernel use.
        """
        shape = a.shape
        flat = a.reshape(L, -1)
        n = flat.shape[1]
        zero = self.is_zero(flat)
        one = self.one_mont((n,))
        b = jnp.where(zero[None], one, flat)
        mul = lambda x, y: self._mont_mul(x, y)
        pre = jax.lax.associative_scan(mul, b, axis=1)
        suf = jax.lax.associative_scan(mul, b, axis=1, reverse=True)
        tinv = self._inv_mont(pre[:, -1:])
        epre = jnp.concatenate([one[:, :1], pre[:, :-1]], axis=1)
        esuf = jnp.concatenate([suf[:, 1:], one[:, :1]], axis=1)
        inv = mul(mul(epre, esuf), jnp.broadcast_to(tinv, (L, n)))
        inv = jnp.where(zero[None], jnp.zeros_like(inv), inv)
        return inv.reshape(shape)

    def pow_const(self, a, e: int):
        """a^e (Montgomery domain), static exponent, scan form."""
        if e == 0:
            return self.one_mont(a.shape[1:])
        bits = jnp.asarray(np.array(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.uint32))

        def body(acc, bit):
            acc = self._mont_sqr(acc)
            acc = jnp.where(bit != 0, self._mont_mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, self.one_mont(a.shape[1:]), bits)
        return acc

    # -- batch select ------------------------------------------------------

    @staticmethod
    def select(cond, a, b):
        """cond: [*batch] bool; a, b: [L, *batch]."""
        return jnp.where(cond[None], a, b)

    def kernel_view(self) -> "_KernelFieldView":
        """Facade for use INSIDE Pallas kernels: un-jitted entry points and
        flat (unrolled) mont_mul, no scan/fori constructs."""
        return _KernelFieldView(self)


class _KernelFieldView:
    fuse_stacks = False  # see CurveOps._mul_many

    def __init__(self, F: FieldOps):
        self._F = F
        self.p = F.p
        # lazy reduction is scoped to the Fq (curve/MSM) kernels; the Fr
        # kernels (NTT butterflies) keep canonical outputs so the mixed
        # kernel/rolled quotient pipeline needs no domain audit
        self._lazy_ok = F.p == FQ_MODULUS

    def _lazy(self) -> bool:
        return self._lazy_ok and lazy_enabled()

    def mont_mul(self, a, b):
        # ULTRAGROTH_MXU_FIELD=1 (read at trace time) switches kernel-mode
        # mont_mul to the matmul-REDC form (ops/mxufield.py): constant-
        # Toeplitz MXU dots for the reduction, f32 byte-limb schoolbook.
        from . import mxufield
        if mxufield.enabled():
            return mxufield.mont_mul_mxu(self._F, a, b)
        return self._F._mont_mul(a, b, unroll=True, lazy=self._lazy())

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def add(self, a, b):
        return self._F._add(a, b, unroll=True, lazy=self._lazy())

    def sub(self, a, b):
        return self._F._sub(a, b, unroll=True, lazy=self._lazy())

    def neg(self, a):
        return self._F._sub(self._F.zero(a.shape[1:]), a, unroll=True,
                            lazy=self._lazy())

    def half(self, a):
        return self._F._half(a)

    def is_zero(self, a):
        if self._lazy():
            return self._F._is_zero_lazy(a)
        return self._F.is_zero(a)

    def eq(self, a, b):
        return self._F.eq(a, b)

    def inv_mont(self, a):
        # rolled Fermat chain - only reachable OUTSIDE kernels (to_affine)
        return self._F._inv_mont(a)

    def zero(self, batch_shape=()):
        return self._F.zero(batch_shape)

    def one_mont(self, batch_shape=()):
        return self._F.one_mont(batch_shape)

    def const(self, value, batch_shape=()):
        return self._F.const(value, batch_shape)

    @staticmethod
    def select(cond, a, b):
        return FieldOps.select(cond, a, b)


@functools.cache
def fr() -> FieldOps:
    return FieldOps(FR_MODULUS, "fr")


@functools.cache
def fq() -> FieldOps:
    return FieldOps(FQ_MODULUS, "fq")
