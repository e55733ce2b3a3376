"""Device-side trusted setup (testkit/dsetup.py) vs the host oracle setup.

The fast setup must be BIT-IDENTICAL: same seed -> same toxic waste -> same
zkey bytes and vk JSON.  That pins the whole device scalar pipeline
(Lagrange-at-tau, coset Lagrange, segment-summed polynomial evals, batched
fixed-base multiplication, batched to_affine, vectorized wire encode)
against the audited Python big-int implementation in one assert.
"""
from ultragroth_tpu.testkit.circuits import LookupCircuit, square_chain_circuit
from ultragroth_tpu.testkit.dsetup import (groth16_setup_fast,
                                           ultragroth_setup_fast)
from ultragroth_tpu.testkit.setup import groth16_setup, ultragroth_setup


def test_groth16_setup_fast_bit_identical():
    r1cs, _ = square_chain_circuit(12, seed=2)
    host = groth16_setup(r1cs, seed=9)
    dev = groth16_setup_fast(r1cs, seed=9)
    assert dev.taus == host.taus
    assert dev.zkey_bytes == host.zkey_bytes
    assert dev.vk_json == host.vk_json


def test_ultragroth_setup_fast_bit_identical():
    circ = LookupCircuit(chunk_values=[3, 1, 3, 0, 2, 3], table_size=4)
    host = ultragroth_setup(circ.r1cs, circ.round_indexes,
                            circ.final_indexes, circ.rand_indx, seed=7)
    dev = ultragroth_setup_fast(circ.r1cs, circ.round_indexes,
                                circ.final_indexes, circ.rand_indx, seed=7)
    assert dev.taus == host.taus
    assert dev.zkey_bytes == host.zkey_bytes
    assert dev.vk_json == host.vk_json
