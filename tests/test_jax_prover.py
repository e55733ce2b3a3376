"""Golden end-to-end: JAX limb-plane prover == oracle prover, and verifies.

The implied reference test (README.md:120-133 drop-in contract): prove
testdata/circuit_final.zkey + witness.wtns, verify against
verification_key.json.
"""
import numpy as np
import pytest

from ultragroth_tpu.io.binfile import BinFile
from ultragroth_tpu.io.wtns import parse_wtns
from ultragroth_tpu.io.zkey import parse_groth16_zkey
from ultragroth_tpu.protocol import groth16 as g16
from ultragroth_tpu.protocol.prover import JaxGroth16Prover

R_BLIND = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678
S_BLIND = 0xFEDCBA0987654321FEDCBA0987654321FEDCBA0987654321FEDCBA09


@pytest.fixture(scope="module")
def golden(golden_zkey_bytes, golden_wtns_bytes):
    zk = parse_groth16_zkey(np.frombuffer(golden_zkey_bytes, np.uint8))
    wt = parse_wtns(np.frombuffer(golden_wtns_bytes, np.uint8))
    return zk, wt


def test_jax_prover_matches_oracle_and_verifies(golden, golden_vk_json):
    zk, wt = golden
    jp = JaxGroth16Prover(zk)
    proof = jp.prove(wt.values, r=R_BLIND, s=S_BLIND)

    op = g16.OracleGroth16Prover(zk)
    expected = op.prove(wt.values, r=R_BLIND, s=S_BLIND)
    assert proof.to_json_dict() == expected.to_json_dict()

    vk = g16.VerificationKey.from_json_dict(golden_vk_json)
    from ultragroth_tpu.io.fieldenc import array_to_ints
    publics = array_to_ints(wt.values[1:zk.n_public + 1])
    assert g16.verify(proof, publics, vk)

    # wrong public input must fail
    assert not g16.verify(proof, [(publics[0] + 1)], vk)
