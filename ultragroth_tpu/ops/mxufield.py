"""Montgomery multiplication with matmul (MXU) Montgomery reduction.

Alternative kernel-mode mont_mul for `FieldOps.kernel_view()`, gated by
`ULTRAGROTH_MXU_FIELD=1` (read at trace time; default off).

Why: a variable*variable limb product is a batched outer product, which
the MXU cannot batch (the shared-matrix contraction degenerates to K=1).
But the two REDC multiplications are by constants — n' = -p^-1 mod 2^256
and p itself — i.e. constant Toeplitz band matrices over byte limbs.
Every intermediate is bounded < 2^24, so the whole pipeline is EXACT in
f32, and f32 `jnp.dot` lowers onto the MXU inside a Pallas kernel.

Pipeline (mirrors the validated prototype, experiments/mxu_redc.py):
  1. byte-split a, b: 16 u16 planes -> 32 f32 byte planes each.
  2. f32 schoolbook: 1024 plane-FMAs into 63 carry-save anti-diagonal
     planes t (entries <= 32*255^2 < 2^21).  No masks/shifts.
  3. byte-split t (3 bytes each, overlapped: entries <= 541), then
     RIPPLE to exact bytes <= 255 (mod 2^256: final carry dropped) and
     m_cs = Np[32,32] @ X  (MXU; sums <= 32*255*255 < 2^21).  The
     ripple is mandatory for the MXU, not a nicety: DEFAULT-precision
     f32 matmuls run as single-pass bf16 on TPU, and bf16 represents
     integers only up to 2^8 exactly — operands <= 255 keep both dots
     bit-exact in one MXU pass (products exact given exact bf16 inputs;
     f32 accumulation of sums < 2^24 exact).
  4. 32-step ripple -> exact m bytes (drop carry = mod 2^256).
  5. mp = Pt[64,32] @ m  (MXU; sums <= 32*255^2 < 2^21).
  6. T = t + mp: ripple 66 byte positions (low 32 vanish mod 2^256),
     repack high half to u16 limbs, one conditional subtract.

All u32<->f32 conversions route through int32 (values < 2^24): Mosaic
has no uint32<->float32 cast (probed on v5e, experiments/queue_r2c.log
"Unsupported cast: uint32 -> float32").

VPU op-count model: ~1700 plane-ops/element vs ~4400 measured for the
fused 16x16 CIOS kernel (512 u32 muls + mask/shift/add chains); the
3072 reduction MACs ride the MXU.  Same I/O contract as
`FieldOps._mont_mul` (a, b < 2^256 with one factor < p; result < p).

The Toeplitz matrices are built IN-KERNEL from python-int scalars via
iota+select (Pallas kernels reject captured array constants, and
`ops/fuse.py` blocks operands over the batch axis so a [32,32] const
cannot be threaded through `fused_map`); ~100 tiny [32,32]-tile ops per
BLOCK, amortized to ~0.1 op/lane at block 1024.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import field as fld

F32 = jnp.float32


def enabled() -> bool:
    """ULTRAGROTH_MXU_FIELD=1 (read at trace time) switches kernel-mode
    mont_mul to this matmul-REDC form.  Single source of truth for the
    flag (field._KernelFieldView consults it lazily)."""
    return os.environ.get("ULTRAGROTH_MXU_FIELD", "") not in ("", "0")


def _u2f(x):
    """u32 -> f32 via int32 (Mosaic-safe; values < 2^24)."""
    return x.astype(jnp.int32).astype(F32)


def _f2u(x):
    """f32 -> u32 via int32 (Mosaic-safe; values < 2^24, non-negative)."""
    return x.astype(jnp.int32).astype(jnp.uint32)


def _toeplitz_bytes(byte_vals, rows: int, cols: int):
    """Banded Toeplitz M[r, c] = byte_vals[r - c] (0 <= r-c < len), built
    from scalar literals only (Pallas-safe)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    d = r - c
    m = jnp.zeros((rows, cols), F32)
    for k, bk in enumerate(byte_vals):
        if bk:
            m = jnp.where(d == k, jnp.full((), float(bk), F32), m)
    return m


def mont_mul_mxu(F: "fld.FieldOps", a, b):
    """(a * b * R^-1) mod p on [L, *batch] u32 limb planes, flat form."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (fld.L,) + batch)
    b = jnp.broadcast_to(b, (fld.L,) + batch)

    nprime = (-pow(F.p, -1, 1 << 256)) % (1 << 256)
    np_bytes = [(nprime >> (8 * k)) & 0xFF for k in range(32)]
    p_bytes = [(F.p >> (8 * k)) & 0xFF for k in range(32)]

    def split(x16):
        planes = []
        for l in range(fld.L):
            planes.append(_u2f(x16[l] & 0xFF))
            planes.append(_u2f(x16[l] >> 8))
        return planes

    af, bf = split(a), split(b)
    bstack = jnp.stack(bf)                              # [32, *batch]

    # 2. schoolbook carry-save product (anti-diagonal planes)
    t = [jnp.zeros(batch, F32) for _ in range(66)]
    for i in range(32):
        prod = af[i][None] * bstack                     # exact: <= 255^2
        for j in range(32):
            t[i + j] = t[i + j] + prod[j]

    # 3. byte-split t -> X (entries <= 541), ripple to exact bytes
    # (<= 255: single-pass-bf16 MXU exactness), then m_cs = Np @ X
    x = [jnp.zeros(batch, F32) for _ in range(34)]
    for p_ in range(32):
        tp = t[p_]
        b1 = jnp.floor(tp * (1.0 / 256.0))
        b2 = jnp.floor(tp * (1.0 / 65536.0))
        x[p_] = x[p_] + (tp - b1 * 256.0)
        x[p_ + 1] = x[p_ + 1] + (b1 - b2 * 256.0)
        x[p_ + 2] = x[p_ + 2] + b2
    c = jnp.zeros(batch, F32)
    for p_ in range(32):                  # final carry dropped = mod 2^256
        s = x[p_] + c
        c = jnp.floor(s * (1.0 / 256.0))
        x[p_] = s - c * 256.0
    xstack = jnp.stack(x[:32]).reshape(32, -1)
    npm = _toeplitz_bytes(np_bytes, 32, 32)
    m_cs = jnp.dot(npm, xstack,
                   preferred_element_type=F32).reshape((32,) + batch)

    # 4. ripple to exact m bytes (mod 2^256)
    m = []
    c = jnp.zeros(batch, F32)
    for l in range(32):
        s = m_cs[l] + c
        c = jnp.floor(s * (1.0 / 256.0))
        m.append(s - c * 256.0)

    # 5. mp = Pt @ m  (MXU)
    ptm = _toeplitz_bytes(p_bytes, 64, 32)
    mp = jnp.dot(ptm, jnp.stack(m).reshape(32, -1),
                 preferred_element_type=F32).reshape((64,) + batch)

    # 6. T = t + mp; ripple; high half; conditional subtract
    c = jnp.zeros(batch, F32)
    out = []
    for l in range(66):
        s = t[l] + c + (mp[l] if l < 64 else 0.0)
        c = jnp.floor(s * (1.0 / 256.0))
        out.append(s - c * 256.0)
    hi = out[32:] + [c]                                 # 35 bytes, < 2p
    limbs = []
    for l in range(17):
        lo8 = _f2u(hi[2 * l])
        h8 = (_f2u(hi[2 * l + 1])
              if 2 * l + 1 < len(hi) else jnp.zeros(batch, jnp.uint32))
        limbs.append(lo8 | (h8 << 8))
    ext = jnp.stack(limbs)                              # [17, *batch] u32
    d, borrow = fld._sub_cla(ext[:16], F._p_bc(batch), unroll=True)
    use_sub = (ext[16] > 0) | (borrow == 0)
    return jnp.where(use_sub[None], d, ext[:16])
