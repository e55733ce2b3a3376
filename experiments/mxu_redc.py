"""Prototype: Montgomery multiplication with MXU (matmul) REDC.

PERF.md lever 4 ("MXU mont-mul").  Analysis first, code below.

Why the obvious idea fails: a variable*variable bigint product is a
batched OUTER product of limb vectors — the MXU contracts a SHARED
matrix against a batch, so per-element outer products get K=1 (or
batched-matmul) utilization, no better than the VPU.  What *is* a
constant shared across the batch is the Montgomery reduction: both REDC
multiplications are by constants (n' = -p^-1 mod 2^256 and p itself),
i.e. constant Toeplitz band matrices over the limb axis.

Pipeline (all ranges chosen for EXACT f32 arithmetic, < 2^24):

  1. byte-split inputs:  16 u16 planes -> 32 byte planes, as f32.
  2. schoolbook product in f32: for i in 32: acc[i:i+32] += a_i * b
     (1024 plane-FMAs, products <= 255^2, anti-diagonal sums
     <= 32*65025 ~ 2.1e6 < 2^24: exact).  Carry-save, NO mask/shift.
  3. m = (T mod 2^256) * n' mod 2^256 as ONE matmul:
     m_cs[32,B] = Np[32,66] @ T_cs[66,B]   (Np banded Toeplitz of n'
     bytes; mod 2^256 = just drop columns >= 32 of the band).
     Entries <= 66*286*255 < 2^23: exact.
  4. ripple m_cs to exact bytes (32-step serial chain, vectorized
     over B; drop the final carry = mod 2^256).
  5. mp_cs[64,B] = Pt[64,32] @ m[32,B]  (Toeplitz of p bytes): exact.
  6. T + m*p: low 32 bytes vanish mod 2^256 (assert), ripple carries,
     take bytes 32..65 -> result < 2p, one conditional subtract.

VPU cost model per element (plane-ops): ~64 byte-split + 1024 FMA +
~100 ripple(m) + ~200 ripple(T) + ~150 repack/subtract ~= 1650, vs
~4400 measured for the current fused CIOS kernel (4.6 ns @ 217 M/s,
~1 GHz * 1024 lanes) -> projected ~2.5x IF f32 FMA throughput matches
u32 mul and the matmuls overlap.  MXU work: 32*66 + 64*32 ~ 4k MACs/el
— noise for the MXU even at 25% utilization (M=32 of 128 rows).

Run (CPU exactness): python experiments/mxu_redc.py
Run (TPU timing):    python experiments/mxu_redc.py tpu [log_batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
L8 = 32                       # byte limbs
R = 1 << 256
NPRIME = (-pow(P, -1, R)) % R  # n' = -p^-1 mod 2^256


def to_bytes_le(v: int, n: int) -> np.ndarray:
    return np.frombuffer(v.to_bytes(n, "little"), np.uint8).astype(np.int64)


P_B = to_bytes_le(P, 32)
NP_B = to_bytes_le(NPRIME, 32)

# Np[l, j] = byte_{l-j}(n') for 0 <= l-j < 32, over j in 0..31 (X byte
# positions; columns >= 32 contribute only multiples of 2^256 = dropped);
# rows l = output byte positions 0..31 (mod 2^256 truncation).
NP_MAT = np.zeros((32, 32), np.float32)
for l in range(32):
    for j in range(32):
        if 0 <= l - j < 32:
            NP_MAT[l, j] = NP_B[l - j]

# Pt[l, j] = byte_{l-j}(p): output positions 0..63 from m bytes 0..31.
PT_MAT = np.zeros((64, 32), np.float32)
for l in range(64):
    for j in range(32):
        if 0 <= l - j < 32:
            PT_MAT[l, j] = P_B[l - j]


def np_model(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """numpy exactness model.  a, b: [32, B] int64 byte planes (canonical
    < p).  Returns [32, B] byte planes of a*b*R^-1 mod p."""
    B = a.shape[1]
    # 2. schoolbook carry-save product over byte planes: T_cs[0..62]
    t = np.zeros((66, B), np.int64)
    for i in range(32):
        t[i:i + 32] += a[i] * b                      # products <= 65025
    assert t.max() <= 32 * 255 * 255 < (1 << 24)
    # 3a. byte-split the carry-save t (entries < 2^21) so the matmul input
    # stays small enough for exact f32: X[p] = b0(t_p)+b1(t_{p-1})+b2(t_{p-2})
    # <= 255+255+31 = 541;  m_cs sums <= 32*541*255 ~ 4.4e6 < 2^24.
    x = np.zeros((68, B), np.int64)
    x[:66] += t & 255
    x[1:67] += (t >> 8) & 255
    x[2:68] += t >> 16
    assert x.max() <= 541
    # 3b. m_cs = Np @ X_lo  (mod 2^256 built into the band truncation)
    m_cs = (NP_MAT.astype(np.int64) @ x[:32])
    assert m_cs.max() < (1 << 24), m_cs.max()
    # 4. ripple to exact m bytes (drop final carry = mod 2^256)
    m = np.zeros((32, B), np.int64)
    c = np.zeros(B, np.int64)
    for l in range(32):
        s = m_cs[l] + c
        m[l] = s & 255
        c = s >> 8
    # 5. mp_cs = Pt @ m
    mp = (PT_MAT.astype(np.int64) @ m)
    assert mp.max() < (1 << 24)
    # 6. T + m*p, ripple everything, take high half
    full = t.copy()
    full[:64] += mp
    c = np.zeros(B, np.int64)
    out = np.zeros((66, B), np.int64)
    for l in range(66):
        s = full[l] + c
        out[l] = s & 255
        c = s >> 8
    assert (out[:32] == 0).all(), "low 256 bits must vanish"
    hi = np.concatenate([out[32:], c[None]], axis=0)  # <= 35 bytes, < 2p
    # conditional subtract p
    val = bytes_to_ints(hi)
    val = np.where(val >= P, val - P, val)
    return ints_to_bytes(val)


def bytes_to_ints(planes: np.ndarray) -> np.ndarray:
    out = np.zeros(planes.shape[1], object)
    for l in range(planes.shape[0] - 1, -1, -1):
        out = out * 256 + planes[l]
    return out


def ints_to_bytes(vals: np.ndarray, n: int = 32) -> np.ndarray:
    out = np.zeros((n, len(vals)), np.int64)
    for l in range(n):
        out[l] = np.array([int(v) & 255 for v in vals], np.int64)
        vals = vals >> 8
    return out


def check_model(trials: int = 200, seed: int = 1):
    rng = np.random.default_rng(seed)
    vals_a = np.array([int.from_bytes(rng.bytes(31), "little") % P
                       for _ in range(trials)], object)
    vals_b = np.array([int.from_bytes(rng.bytes(31), "little") % P
                       for _ in range(trials)], object)
    got = bytes_to_ints(np_model(ints_to_bytes(vals_a), ints_to_bytes(vals_b)))
    rinv = pow(R, -1, P)
    want = (vals_a * vals_b * rinv) % np.array([P], object)
    assert (got == want).all(), "mismatch"
    # edge cases: 0, 1, p-1
    edges = np.array([0, 1, P - 1, P - 1, 0], object)
    edges_b = np.array([0, P - 1, P - 1, 1, P - 1], object)
    got = bytes_to_ints(np_model(ints_to_bytes(edges), ints_to_bytes(edges_b)))
    want = (edges * edges_b * rinv) % np.array([P], object)
    assert (got == want).all(), "edge mismatch"
    print(f"np model exact on {trials} random + edge cases")


# ---------------------------------------------------------------- JAX form

def jax_mont_mul_mxu(a16, b16):
    """JAX version operating on the repo's [16, B] u32 16-bit limb planes.

    Designed so every step lowers inside a Pallas kernel: straight-line,
    no scan/scatter; the two matmuls are jnp.dot on f32 (MXU).  Constant
    matrices must be passed as operands when kernelized (kernels must not
    capture const arrays) — kept module-level here for the XLA prototype.
    """
    import jax.numpy as jnp
    B = a16.shape[1:]
    # 1. byte split -> f32 [32, B] (u32->f32 via int32: Mosaic-safe)
    def split(x):
        planes = []
        for l in range(16):
            planes.append((x[l] & 0xFF).astype(jnp.int32).astype(jnp.float32))
            planes.append((x[l] >> 8).astype(jnp.int32).astype(jnp.float32))
        return planes
    af, bf = split(a16), split(b16)
    bstack = jnp.stack(bf)                            # [32, B]
    # 2. schoolbook f32 carry-save: t[66, B] (63 used)
    t = [jnp.zeros(B, jnp.float32) for _ in range(66)]
    for i in range(32):
        prod = af[i][None] * bstack                   # [32, B] exact
        for j in range(32):
            t[i + j] = t[i + j] + prod[j]
    # 3a. byte-split t -> X (f32-exact matmul input; see np_model)
    x = [jnp.zeros(B, jnp.float32) for _ in range(34)]
    for p in range(32):                               # only X[:32] is used
        tp = t[p]
        b1 = jnp.floor(tp * (1.0 / 256.0))
        b2 = jnp.floor(tp * (1.0 / 65536.0))
        x[p] = x[p] + (tp - b1 * 256.0)
        if p + 1 < 34:
            x[p + 1] = x[p + 1] + (b1 - b2 * 256.0)
        if p + 2 < 34:
            x[p + 2] = x[p + 2] + b2
    # ripple X to exact bytes <= 255: DEFAULT-precision f32 matmul is
    # single-pass bf16 on the MXU and bf16 is exact only up to 2^8
    c = jnp.zeros(B, jnp.float32)
    for p in range(32):                # final carry dropped = mod 2^256
        s = x[p] + c
        c = jnp.floor(s * (1.0 / 256.0))
        x[p] = s - c * 256.0
    xstack = jnp.stack(x[:32])                        # [32, B]
    # 3b. m_cs = Np @ X
    m_cs = jnp.dot(jnp.asarray(NP_MAT), xstack.reshape(32, -1),
                   preferred_element_type=jnp.float32).reshape((32,) + B)
    # 4. ripple m (f32-exact: values < 2^23, carries < 2^16)
    m = []
    c = jnp.zeros(B, jnp.float32)
    for l in range(32):
        s = m_cs[l] + c
        c = jnp.floor(s * (1.0 / 256.0))
        m.append(s - c * 256.0)
    mstack = jnp.stack(m)
    # 5. mp = Pt @ m
    mp = jnp.dot(jnp.asarray(PT_MAT), mstack.reshape(32, -1),
                 preferred_element_type=jnp.float32).reshape((64,) + B)
    # 6. combine + ripple; low 32 bytes vanish
    c = jnp.zeros(B, jnp.float32)
    out = []
    for l in range(66):
        s = t[l] + (mp[l] if l < 64 else 0.0) + c
        c = jnp.floor(s * (1.0 / 256.0))
        out.append(s - c * 256.0)
    hi = out[32:] + [c]                               # 35 byte planes < 2p
    # repack to u32 16-bit limb planes (17 needed pre-subtract; value < 2p
    # < 2^255 so byte 33/34 fold into limb 16 which stays < 2^16)
    f2u = lambda v: v.astype(jnp.int32).astype(jnp.uint32)
    limbs = []
    for l in range(17):
        lo = f2u(hi[2 * l])
        hi8 = (f2u(hi[2 * l + 1])
               if 2 * l + 1 < len(hi) else jnp.zeros(B, jnp.uint32))
        limbs.append(lo | (hi8 << 8))
    ext = jnp.stack(limbs)                            # [17, B] u32
    # conditional subtract p (16-limb compare on the low part + bit 256)
    from ultragroth_tpu.ops import field as fld
    d, borrow = fld._sub_cla(ext[:16], jnp.broadcast_to(
        jnp.asarray(fld.fr().p_limbs, jnp.uint32).reshape((16,) + (1,) * len(B)),
        (16,) + B))
    use_sub = (ext[16] > 0) | (borrow == 0)
    return jnp.where(use_sub[None], d, ext[:16])


def _kernel_body(a16, b16, npm, ptm, pp):
    """Straight-line kernel body shared by the Pallas kernel and its
    interpret-mode test: [16, blk] u32 limb planes + const matrices as
    OPERANDS (kernels must not capture const arrays)."""
    import jax.numpy as jnp
    blk = a16.shape[1:]

    def split(xs):
        planes = []
        for l in range(16):
            planes.append((xs[l] & 0xFF).astype(jnp.int32).astype(jnp.float32))
            planes.append((xs[l] >> 8).astype(jnp.int32).astype(jnp.float32))
        return planes

    af, bf = split(a16), split(b16)
    bstack = jnp.stack(bf)
    t = [jnp.zeros(blk, jnp.float32) for _ in range(66)]
    for i in range(32):
        prod = af[i][None] * bstack
        for j in range(32):
            t[i + j] = t[i + j] + prod[j]
    x = [jnp.zeros(blk, jnp.float32) for _ in range(34)]
    for p in range(32):
        tp = t[p]
        b1 = jnp.floor(tp * (1.0 / 256.0))
        b2 = jnp.floor(tp * (1.0 / 65536.0))
        x[p] = x[p] + (tp - b1 * 256.0)
        x[p + 1] = x[p + 1] + (b1 - b2 * 256.0)
        x[p + 2] = x[p + 2] + b2
    c = jnp.zeros(blk, jnp.float32)
    for p in range(32):                # exact bytes: bf16-exact MXU dot
        s = x[p] + c
        c = jnp.floor(s * (1.0 / 256.0))
        x[p] = s - c * 256.0
    xstack = jnp.stack(x[:32])
    m_cs = jnp.dot(npm, xstack, preferred_element_type=jnp.float32)
    m = []
    c = jnp.zeros(blk, jnp.float32)
    for l in range(32):
        s = m_cs[l] + c
        c = jnp.floor(s * (1.0 / 256.0))
        m.append(s - c * 256.0)
    mp = jnp.dot(ptm, jnp.stack(m), preferred_element_type=jnp.float32)
    c = jnp.zeros(blk, jnp.float32)
    out = []
    for l in range(66):
        s = t[l] + c + (mp[l] if l < 64 else 0.0)
        c = jnp.floor(s * (1.0 / 256.0))
        out.append(s - c * 256.0)
    hi = out[32:] + [c]
    f2u = lambda v: v.astype(jnp.int32).astype(jnp.uint32)
    limbs = []
    for l in range(17):
        lo8 = f2u(hi[2 * l])
        h8 = (f2u(hi[2 * l + 1])
              if 2 * l + 1 < len(hi) else jnp.zeros(blk, jnp.uint32))
        limbs.append(lo8 | (h8 << 8))
    ext = jnp.stack(limbs)
    from ultragroth_tpu.ops import field as fld
    pbc = jnp.broadcast_to(pp[:, :1], (16,) + blk)
    d, borrow = fld._sub_cla(ext[:16], pbc, unroll=True)
    use_sub = (ext[16] > 0) | (borrow == 0)
    return jnp.where(use_sub[None], d, ext[:16])


def pallas_mont_mul_mxu(a16, b16, block: int = 1024, interpret: bool = False):
    """One fused Pallas kernel: HBM->VMEM once, schoolbook FMAs + two MXU
    dots + ripples all VMEM-resident, result planes stream back once."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:
        vmem = None
    n = a16.shape[1]
    pad = (-n) % block
    if pad:
        a16 = jnp.pad(a16, [(0, 0), (0, pad)])
        b16 = jnp.pad(b16, [(0, 0), (0, pad)])
    npn = n + pad
    npm = jnp.asarray(NP_MAT)
    ptm = jnp.asarray(PT_MAT)
    from ultragroth_tpu.ops import field as fld
    pp = jnp.broadcast_to(jnp.asarray(
        np.array(fld.fr().p_limbs, np.uint32))[:, None], (16, 128))

    def kernel(a_ref, b_ref, npm_ref, ptm_ref, pp_ref, o_ref):
        o_ref[...] = _kernel_body(a_ref[...], b_ref[...],
                                  npm_ref[...], ptm_ref[...], pp_ref[...])

    kw = dict(memory_space=vmem) if vmem is not None else {}
    out = pl.pallas_call(
        kernel,
        grid=(npn // block,),
        in_specs=[pl.BlockSpec((16, block), lambda i: (0, i), **kw),
                  pl.BlockSpec((16, block), lambda i: (0, i), **kw),
                  pl.BlockSpec((32, 32), lambda i: (0, 0), **kw),
                  pl.BlockSpec((64, 32), lambda i: (0, 0), **kw),
                  pl.BlockSpec((16, 128), lambda i: (0, 0), **kw)],
        out_specs=pl.BlockSpec((16, block), lambda i: (0, i), **kw),
        out_shape=jax.ShapeDtypeStruct((16, npn), jnp.uint32),
        interpret=interpret,
    )(a16, b16, npm, ptm, pp)
    return out[:, :n]


def check_pallas_interpret(trials: int = 256, seed: int = 4):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ultragroth_tpu.ops.field import fr
    F = fr()
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 16, size=(16, trials), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(16, trials), dtype=np.uint32)
    a[15] &= 0x2FFF
    b[15] &= 0x2FFF
    want = np.asarray(F._mont_mul(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(pallas_mont_mul_mxu(jnp.asarray(a), jnp.asarray(b),
                                         block=128, interpret=True))
    assert (got == want).all(), "pallas interpret mismatch"
    print(f"pallas kernel (interpret) matches on {trials} samples, "
          f"incl. padding path")


def check_jax(trials: int = 128, seed: int = 2):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ultragroth_tpu.ops.field import fr
    F = fr()
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 16, size=(16, trials), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(16, trials), dtype=np.uint32)
    a[15] &= 0x2FFF
    b[15] &= 0x2FFF
    want = np.asarray(F._mont_mul(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(jax.jit(jax_mont_mul_mxu)(jnp.asarray(a), jnp.asarray(b)))
    assert (got == want).all(), "jax MXU-REDC mismatch vs FieldOps CIOS"
    print(f"jax form matches FieldOps._mont_mul on {trials} samples")


def time_tpu(log_batch: int = 20):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from ultragroth_tpu.ops import kernels
    n = 1 << log_batch
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    a[15] &= 0x2FFF
    b[15] &= 0x2FFF
    a, b = jnp.asarray(a), jnp.asarray(b)
    np.asarray((a + b)[0, :2])

    def sync(x):
        return np.asarray(x.reshape(-1)[:2])

    def timeit(name, fn):
        try:
            t0 = time.perf_counter()
            sync(fn(a, b))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(3):
                sync(fn(a, b))
            dt = (time.perf_counter() - t0) / 3
            print(f"{name}: {dt*1e3:.2f} ms = {n/dt/1e6:.0f} M mul/s "
                  f"(compile+first {tc:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    cios = kernels.fr_mont_mul()      # cached factory -> the kernel fn
    timeit("fused CIOS kernel (baseline)", lambda x, y: cios(x, y))
    timeit("MXU-REDC fused pallas b=1024",
           jax.jit(lambda x, y: pallas_mont_mul_mxu(x, y, block=1024)))
    timeit("MXU-REDC fused pallas b=512",
           jax.jit(lambda x, y: pallas_mont_mul_mxu(x, y, block=512)))
    timeit("MXU-REDC (plain XLA)", jax.jit(jax_mont_mul_mxu))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tpu":
        time_tpu(int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    else:
        check_model()
        check_jax()
        check_pallas_interpret()
