"""Host-side limb packing for the TPU field kernels.

Device layout: a batch of field elements is a uint32 array of shape
[L, *batch] with L = 16 little-endian 16-bit limbs ("limb planes").  Putting
the limb axis FIRST keeps the batch on the TPU sublane x lane grid, so every
VPU op runs at full width; the 16-bit limb width keeps every partial product
of the Montgomery multiplier exactly representable in uint32.

This replaces the reference's per-element 4x64 Montgomery representation
(/root/reference/build/fr_element.hpp:15-19) with an array-first encoding.
The wire format (32-byte little-endian words) converts to/from limb planes by
pure bit-shuffling - no field math.
"""
from __future__ import annotations

import numpy as np

LIMB_BITS = 16
NLIMBS = 16  # 256 bits
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Python int -> [nlimbs] uint32 little-endian 16-bit limbs."""
    out = np.empty(nlimbs, dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(limbs) -> int:
    v = 0
    for i, w in enumerate(np.asarray(limbs).reshape(-1)):
        v |= int(w) << (LIMB_BITS * i)
    return v


def ints_to_planes(values) -> np.ndarray:
    """Iterable of ints -> [NLIMBS, N] uint32 limb planes."""
    n = len(values)
    out = np.empty((NLIMBS, n), dtype=np.uint32)
    for j, v in enumerate(values):
        v = int(v)
        for i in range(NLIMBS):
            out[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def u32_to_planes(values: np.ndarray) -> np.ndarray:
    """[N] uint32 small values -> [NLIMBS, N] limb planes (vectorized)."""
    values = np.asarray(values, dtype=np.uint32)
    out = np.zeros((NLIMBS,) + values.shape, dtype=np.uint32)
    out[0] = values & np.uint32(LIMB_MASK)
    out[1] = values >> np.uint32(LIMB_BITS)
    return out


def planes_to_ints(planes: np.ndarray) -> list:
    """[NLIMBS, *batch] -> flat list of ints (vectorized via object dtype)."""
    planes = np.asarray(planes)
    acc = np.zeros(planes.shape[1:], dtype=object)
    for i in range(planes.shape[0] - 1, -1, -1):
        acc = acc * (1 << LIMB_BITS) + planes[i].astype(object)
    return list(np.asarray(acc, dtype=object).reshape(-1))


def words_to_planes(words: np.ndarray) -> np.ndarray:
    """Wire encoding [..., 8] u32 (32-bit words) -> [NLIMBS, ...] limb planes.

    Pure bit-shuffle: limb[2i] = lo16(word[i]), limb[2i+1] = hi16(word[i]).
    Large 2-D inputs take the threaded native path when built
    (native/ultragroth_io.cpp: ug_words_to_planes).
    """
    words = np.asarray(words, dtype=np.uint32)
    if words.ndim == 2 and words.shape[-1] * 2 == NLIMBS and words.shape[0] >= (1 << 14):
        from .. import native as _native
        out = _native.words_to_planes(words)
        if out is not None:
            return out
    lo = words & np.uint32(0xFFFF)
    hi = words >> np.uint32(16)
    inter = np.stack([lo, hi], axis=-1).reshape(*words.shape[:-1], NLIMBS)
    return np.moveaxis(inter, -1, 0).copy()


def words_to_planes_device(words) -> "jax.Array":
    """Device-side words_to_planes: upload the [N, 8] u32 wire form (32 B
    per value) and split limbs ON DEVICE, instead of uploading host-split
    [16, N] planes (64 B per value — 16-bit limbs in u32 lanes).

    Halves witness H2D bytes; at 2^20+ vars the upload through the
    ~85 MB/s axon relay is a scale-sensitive prove phase (round-4
    verdict item 7: 'upload' traced at 867 ms on the golden circuit)."""
    import jax.numpy as jnp
    w = jnp.asarray(words)                       # H2D of the compact form
    lo = (w & jnp.uint32(LIMB_MASK)).T           # [8, N]
    hi = (w >> LIMB_BITS).T
    return jnp.stack([lo, hi], axis=1).reshape(NLIMBS, -1)


def planes_to_words(planes: np.ndarray) -> np.ndarray:
    """[NLIMBS, ...] limb planes -> [..., 8] u32 wire words."""
    planes = np.asarray(planes, dtype=np.uint32)
    inter = np.moveaxis(planes, 0, -1)  # [..., 16]
    pairs = inter.reshape(*inter.shape[:-1], 8, 2)
    return (pairs[..., 0] | (pairs[..., 1] << np.uint32(16))).copy()
