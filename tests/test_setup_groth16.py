"""Synthetic Groth16 setup (testkit) -> oracle prove -> verify."""
import numpy as np

from ultragroth_tpu.io.fieldenc import array_to_ints
from ultragroth_tpu.io.zkey import parse_groth16_zkey
from ultragroth_tpu.protocol import groth16 as g16
from ultragroth_tpu.testkit.circuits import square_chain_circuit
from ultragroth_tpu.testkit.setup import groth16_setup


def test_square_chain_prove_verify():
    r1cs, wtns = square_chain_circuit(13, seed=3)
    setup = groth16_setup(r1cs, seed=5)
    zk = parse_groth16_zkey(np.frombuffer(setup.zkey_bytes, np.uint8))
    assert zk.n_vars == r1cs.n_vars

    prover = g16.OracleGroth16Prover(zk)
    proof = prover.prove(wtns, r=123456789, s=987654321)
    vk = g16.VerificationKey.from_json_dict(setup.vk_json)
    publics = array_to_ints(wtns[1:2])
    assert g16.verify(proof, publics, vk)
    assert not g16.verify(proof, [publics[0] + 1], vk)
