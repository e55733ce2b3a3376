"""The correctness anchor: oracle prove on golden testdata must verify
against the shipped verification key via our own pairing.

Reference flow: §3.1 of SURVEY.md / src/groth16.cpp:48-203.
"""
import json

import pytest

from ultragroth_tpu.io.fieldenc import words_to_int
from ultragroth_tpu.io.wtns import parse_wtns
from ultragroth_tpu.io.zkey import parse_groth16_zkey
from ultragroth_tpu.protocol import groth16 as g16


@pytest.mark.slow
def test_oracle_prove_golden(golden_zkey_bytes, golden_wtns_bytes, golden_vk_json):
    zk = parse_groth16_zkey(golden_zkey_bytes)
    w = parse_wtns(golden_wtns_bytes)
    prover = g16.OracleGroth16Prover(zk)
    proof = prover.prove(w.values, r=0xDEADBEEF, s=0xC0FFEE123456789)

    vk = g16.VerificationKey.from_json_dict(golden_vk_json)
    pub = [words_to_int(w.values[i]) for i in range(1, zk.n_public + 1)]
    assert g16.verify(proof, pub, vk)

    # JSON shape parity with Proof::toJson (src/groth16.cpp:217-250)
    d = proof.to_json_dict()
    assert set(d) == {"pi_a", "pi_b", "pi_c", "protocol"}
    assert d["protocol"] == "groth16"
    assert d["pi_a"][2] == "1"
    assert d["pi_b"][2] == ["1", "0"]

    # tampered proof must fail
    bad = g16.Proof(proof.pi_a, proof.pi_b, proof.pi_a)
    assert not g16.verify(bad, pub, vk)
