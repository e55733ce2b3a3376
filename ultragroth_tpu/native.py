"""ctypes bindings for the native host runtime (native/ultragroth_io.cpp).

Every entry point has a pure-python/numpy fallback, so the package works
without the compiled library; the native paths matter for multi-GB zkey
loading (mmap + threaded limb repack) and tight Fiat-Shamir loops.

Build: `make -C native` (or cmake); the .so lands in ultragroth_tpu/_native/.
"""
from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

_LIB = None
_TRIED = False


class _Section(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32), ("offset", ctypes.c_uint64),
                ("size", ctypes.c_uint64)]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = pathlib.Path(__file__).parent
    for cand in [here / "_native" / "libultragroth_io.so",
                 here / "_native" / "ultragroth_io.so"]:
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
            except OSError:
                continue
            lib.ug_load_file.restype = ctypes.c_void_p
            lib.ug_load_file.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_uint64)]
            lib.ug_unload_file.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.ug_binfile_scan.restype = ctypes.c_int64
            lib.ug_binfile_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(_Section),
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32)]
            lib.ug_words_to_planes.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_void_p, ctypes.c_int]
            lib.ug_planes_to_words.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_void_p]
            lib.ug_keccak256.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                         ctypes.c_char_p]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def keccak256(data: bytes) -> bytes | None:
    """Native Keccak-256 or None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.ug_keccak256(data, len(data), out)
    return out.raw


def words_to_planes(words: np.ndarray) -> np.ndarray | None:
    """[N, W] u32 -> [2W, N] limb planes via the threaded native shuffle."""
    lib = _load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.uint32)
    n, n_words = words.shape
    planes = np.empty((2 * n_words, n), dtype=np.uint32)
    lib.ug_words_to_planes(
        words.ctypes.data_as(ctypes.c_void_p), n, n_words,
        planes.ctypes.data_as(ctypes.c_void_p), os.cpu_count() or 1)
    return planes


def binfile_scan(data: np.ndarray):
    """-> (version, [(type, offset, size)]) or None without the library."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    max_sections = 64
    sections = (_Section * max_sections)()
    version = ctypes.c_uint32(0)
    n = lib.ug_binfile_scan(
        data.ctypes.data_as(ctypes.c_void_p), data.size, sections,
        max_sections, ctypes.byref(version))
    if n < 0:
        raise ValueError("invalid binfile")
    return version.value, [(sections[i].type, sections[i].offset,
                            sections[i].size) for i in range(min(n, max_sections))]
