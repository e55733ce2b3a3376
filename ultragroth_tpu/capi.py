"""Thin adapters consumed by the embedded-C ABI shim
(native/ultragroth_capi.cpp).  All functions take/return only C-friendly
types (bytes in, str/int out)."""
from __future__ import annotations

from .runtime import configure as _configure_runtime

_configure_runtime()

from . import api


def groth16_prove(zkey: bytes, wtns: bytes):
    return api.groth16_prover(zkey, wtns)


def ultra_groth_prove(zkey: bytes, uwtns: bytes):
    return api.ultra_groth_prover(zkey, uwtns)


def groth16_public_size(zkey: bytes) -> int:
    return api.groth16_public_size_for_zkey_buf(zkey)


def ultra_groth_public_size(zkey: bytes) -> int:
    return api.ultra_groth_public_size_for_zkey_buf(zkey)


def groth16_verify(proof: str, inputs: str, vk: str) -> int:
    return api.groth16_verify(proof, inputs, vk)


def ultra_groth_verify(proof: str, inputs: str, vk: str) -> int:
    return api.ultra_groth_verify(proof, inputs, vk)


# -- handle API (create-once / prove-many; src/prover.h:80-163) --------------

def groth16_create(zkey: bytes):
    return api.Groth16Prover(zkey)


def ultra_groth_create(zkey: bytes):
    return api.UltraGrothProver(zkey)


def groth16_create_file(path: str):
    return api.Groth16Prover.from_file(path)


def ultra_groth_create_file(path: str):
    return api.UltraGrothProver.from_file(path)


def prover_prove(prover, wtns: bytes):
    """Shared by both handle types: -> (proof_json, public_json)."""
    return prover.prove(wtns)


def groth16_public_size_file(path: str) -> int:
    return api.groth16_public_size_for_zkey_file(path)


def ultra_groth_public_size_file(path: str) -> int:
    return api.ultra_groth_public_size_for_zkey_file(path)

