"""UltraGroth end-to-end on a synthetic lookup fixture (none ships with the
reference - SURVEY.md section 4): setup -> 2-round prove -> 5-pairing verify."""
import numpy as np
import pytest

from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.io.fieldenc import array_to_ints
from ultragroth_tpu.io.wtns import parse_wtns
from ultragroth_tpu.io.zkey import parse_ultragroth_zkey
from ultragroth_tpu.protocol import ultragroth as ug
from ultragroth_tpu.testkit.circuits import LookupCircuit
from ultragroth_tpu.testkit.setup import ultragroth_setup

R0 = 0xAAAA567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678
RB = 0xBBBB567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678
SB = 0xCCCC567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678


@pytest.fixture(scope="module")
def fixture():
    circ = LookupCircuit(chunk_values=[3, 1, 3, 0, 2, 3], table_size=4)
    setup = ultragroth_setup(circ.r1cs, circ.round_indexes,
                             circ.final_indexes, circ.rand_indx, seed=7)
    zk = parse_ultragroth_zkey(np.frombuffer(setup.zkey_bytes, np.uint8))
    wt = parse_wtns(np.frombuffer(circ.uwtns_bytes(), np.uint8))
    return circ, setup, zk, wt


def test_zkey_roundtrip(fixture):
    circ, setup, zk, wt = fixture
    assert zk.n_vars == circ.r1cs.n_vars
    assert zk.n_public == 2
    assert zk.rand_indx == 1
    assert zk.num_indexes_c1 == len(circ.round_indexes)
    assert zk.num_indexes_c2 == len(circ.final_indexes)
    assert list(zk.round_indexes) == circ.round_indexes
    assert wt.chunks is not None
    assert list(wt.frequencies) == circ.frequencies


def test_oracle_prove_verify(fixture):
    circ, setup, zk, wt = fixture
    prover = ug.OracleUltraGrothProver(zk)
    proof, w_final = prover.prove(wt.values, wt, r0=R0, r=RB, s=SB)

    vk = ug.UltraGrothVerificationKey.from_json_dict(setup.vk_json)
    publics = ug.public_signals(w_final, zk.n_public, zk.rand_indx)
    assert publics == [circ.pub_x]
    assert ug.verify(proof, publics, vk)

    # challenge is bound to the round commitment
    assert ug.derive_challenge(proof.pi_r) == w_final[zk.rand_indx]

    # tampered public input fails
    assert not ug.verify(proof, [(circ.pub_x + 1) % R], vk)

    # tampered round commitment fails (challenge re-derivation diverges)
    from ultragroth_tpu.oracle import curve as oc
    bad = ug.UltraGrothProof(proof.pi_a, proof.pi_b, proof.pi_f,
                             oc.g1_add(proof.pi_r, (1, 2)))
    assert not ug.verify(bad, publics, vk)


def test_constraints_satisfied_after_lookup(fixture):
    """The witness (with challenge-derived signals) satisfies the R1CS."""
    circ, setup, zk, wt = fixture
    prover = ug.OracleUltraGrothProver(zk)
    _, w = prover.prove(wt.values, wt, r0=R0, r=RB, s=SB)
    for a, b, c in circ.r1cs.rows:
        av = sum(w[s] * v for s, v in a.items()) % R
        bv = sum(w[s] * v for s, v in b.items()) % R
        cv = sum(w[s] * v for s, v in c.items()) % R
        assert av * bv % R == cv


def test_proof_json_shape(fixture):
    circ, setup, zk, wt = fixture
    prover = ug.OracleUltraGrothProver(zk)
    proof, _ = prover.prove(wt.values, wt, r0=R0, r=RB, s=SB)
    d = proof.to_json_dict()
    assert set(d) == {"pi_a", "pi_b", "pi_f", "pi_r", "protocol"}
    assert d["protocol"] == "ultragroth"
    back = ug.UltraGrothProof.from_json_dict(d)
    assert back == proof


def test_jax_ultragroth_matches_oracle(fixture):
    from ultragroth_tpu.protocol.prover import JaxUltraGrothProver
    circ, setup, zk, wt = fixture
    oracle = ug.OracleUltraGrothProver(zk)
    expected, w_o = oracle.prove(wt.values, wt, r0=R0, r=RB, s=SB)
    jp = JaxUltraGrothProver(zk)
    proof, w_j = jp.prove(wt.values, wt, r0=R0, r=RB, s=SB)
    assert proof.to_json_dict() == expected.to_json_dict()
    assert w_j == w_o
    vk = ug.UltraGrothVerificationKey.from_json_dict(setup.vk_json)
    publics = ug.public_signals(w_j, zk.n_public, zk.rand_indx)
    assert ug.verify(proof, publics, vk)
