"""Batched Fq2 = Fq[u]/(u^2+1) arithmetic on limb planes.

Mirrors the behavioral contract of the ffiasm F2Element tower used by the
reference engine (usage at /root/reference/src/groth16.cpp:366-520), rebuilt
as batched limb-plane ops.  An Fq2 batch is a tuple (c0, c1) of [L, *batch]
uint32 arrays (a pytree, so it flows through jit/scan/vmap transparently).
"""
from __future__ import annotations

import jax.numpy as jnp

from .field import FieldOps, fq


class Fq2Ops:
    def __init__(self, base: FieldOps | None = None):
        self.fq = base or fq()
        self.fuse_stacks = getattr(self.fq, "fuse_stacks", True)

    def zero(self, batch_shape=()):
        z = self.fq.zero(batch_shape)
        return (z, z)

    def one_mont(self, batch_shape=()):
        return (self.fq.one_mont(batch_shape), self.fq.zero(batch_shape))

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def neg(self, a):
        return (self.fq.neg(a[0]), self.fq.neg(a[1]))

    def conj(self, a):
        return (a[0], self.fq.neg(a[1]))

    def mont_mul(self, a, b):
        """Karatsuba: 3 base muls."""
        F = self.fq
        t0 = F.mont_mul(a[0], b[0])
        t1 = F.mont_mul(a[1], b[1])
        t2 = F.mont_mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        c0 = F.sub(t0, t1)
        c1 = F.sub(F.sub(t2, t0), t1)
        return (c0, c1)

    def mont_sqr(self, a):
        """(a0+a1)(a0-a1) + 2 a0 a1 u: 2 base muls."""
        F = self.fq
        c0 = F.mont_mul(F.add(a[0], a[1]), F.sub(a[0], a[1]))
        t = F.mont_mul(a[0], a[1])
        return (c0, F.add(t, t))

    def mul_fq(self, a, s):
        """Fq2 * Fq (s: [L, *batch] planes)."""
        F = self.fq
        return (F.mont_mul(a[0], s), F.mont_mul(a[1], s))

    def inv_mont(self, a):
        F = self.fq
        norm = F.add(F.mont_mul(a[0], a[0]), F.mont_mul(a[1], a[1]))
        ninv = F.inv_mont(norm)
        return (F.mont_mul(a[0], ninv), F.neg(F.mont_mul(a[1], ninv)))

    def batch_inv_mont(self, a):
        """Batched Fq2 inversion via ONE Fq Montgomery-trick batch
        inversion of the norms (a0^2 + a1^2); inv(0) = 0."""
        F = self.fq
        norm = F.add(F.mont_mul(a[0], a[0]), F.mont_mul(a[1], a[1]))
        ninv = F.batch_inv_mont(norm)
        return (F.mont_mul(a[0], ninv), F.neg(F.mont_mul(a[1], ninv)))

    def is_zero(self, a):
        return self.fq.is_zero(a[0]) & self.fq.is_zero(a[1])

    def eq(self, a, b):
        return self.fq.eq(a[0], b[0]) & self.fq.eq(a[1], b[1])

    def to_mont(self, a):
        return (self.fq.to_mont(a[0]), self.fq.to_mont(a[1]))

    def from_mont(self, a):
        return (self.fq.from_mont(a[0]), self.fq.from_mont(a[1]))

    @staticmethod
    def select(cond, a, b):
        return (jnp.where(cond[None], a[0], b[0]), jnp.where(cond[None], a[1], b[1]))
