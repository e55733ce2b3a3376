"""Mesh-sharded MSM / NTT on the 8-device virtual CPU mesh."""
import random

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.field import fr
from ultragroth_tpu.oracle import curve as oc
from ultragroth_tpu.parallel.msm import msm_g1_sharded
from ultragroth_tpu.parallel.ntt import ntt_sharded
from ultragroth_tpu.protocol import quotient as oq
from ultragroth_tpu.protocol.transcript import root_of_unity

from tests.test_curve_ops import g1_batch_to_planes, g1_affine_from_device

RNG = random.Random(42)
FR = fr()


def _mesh():
    devs = np.array(jax.devices())
    assert devs.size >= 8, devs
    return Mesh(devs[:8], ("data",))


def test_sharded_ntt_vs_oracle():
    log_n = 8
    n = 1 << log_n
    vals = [RNG.randrange(R) for _ in range(n)]
    a = FR.to_mont(lb.ints_to_planes(vals))
    w = root_of_unity(log_n)
    with _mesh() as mesh:
        got = np.asarray(FR.from_mont(ntt_sharded(a, log_n, mesh)))
        assert lb.planes_to_ints(got) == oq.ntt(vals, w)

        back = FR.from_mont(ntt_sharded(
            FR.to_mont(lb.ints_to_planes(oq.ntt(vals, w))), log_n, mesh,
            inverse=True))
        assert lb.planes_to_ints(np.asarray(back)) == vals


def test_sharded_msm_vs_oracle():
    n = 96
    pts = [oc.g1_mul(oc.G1, RNG.randrange(1, R)) for _ in range(n)]
    scalars = [RNG.randrange(R) for _ in range(n - 1)] + [0]
    x, y, inf = g1_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    with _mesh() as mesh:
        out = msm_g1_sharded(x, y, inf, sc, mesh, c=8)
    from ultragroth_tpu.ops.curve import g1_ops
    got = g1_affine_from_device(*jax.jit(g1_ops().to_affine)(out))[0]
    assert got == oc.g1_msm(pts, scalars)


# ---------------------------------------------------------------------------
# Mesh-wired PUBLIC prover (VERDICT round-1 item 2): the full prove runs
# sharded and matches the single-device proof bit-for-bit.
# ---------------------------------------------------------------------------

R_BLIND = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678
S_BLIND = 0xFEDCBA0987654321FEDCBA0987654321FEDCBA0987654321FEDCBA09


def test_mesh_prover_bitexact_and_verifies(golden_zkey_bytes,
                                           golden_wtns_bytes,
                                           golden_vk_json):
    from ultragroth_tpu.io.fieldenc import array_to_ints
    from ultragroth_tpu.io.wtns import parse_wtns
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.protocol import groth16 as g16
    from ultragroth_tpu.protocol.prover import JaxGroth16Prover

    zk = parse_groth16_zkey(np.frombuffer(golden_zkey_bytes, np.uint8))
    wt = parse_wtns(np.frombuffer(golden_wtns_bytes, np.uint8))
    with _mesh() as mesh:
        sharded = JaxGroth16Prover(zk, mesh=mesh)
        proof = sharded.prove(wt.values, r=R_BLIND, s=S_BLIND)

    single = JaxGroth16Prover(zk).prove(wt.values, r=R_BLIND, s=S_BLIND)
    assert proof.to_json_dict() == single.to_json_dict()

    vk = g16.VerificationKey.from_json_dict(golden_vk_json)
    publics = array_to_ints(wt.values[1:zk.n_public + 1])
    assert g16.verify(proof, publics, vk)


def test_mesh_prover_api_devices_arg(golden_zkey_bytes, golden_wtns_bytes,
                                     golden_vk_json):
    """api.Groth16Prover(devices=...) twin of the same path."""
    import json
    from ultragroth_tpu import api

    prover = api.Groth16Prover(golden_zkey_bytes, devices=8)
    proof_json, public_json = prover.prove(golden_wtns_bytes)
    assert api.groth16_verify(proof_json, public_json,
                              json.dumps(golden_vk_json)) \
        == api.VERIFIER_VALID_PROOF


def test_two_axis_host_chip_mesh_prover(golden_zkey_bytes,
                                        golden_wtns_bytes, golden_vk_json):
    """SURVEY section 5.8 multi-host story: a ('host', 'chip') 2-axis mesh
    (2 virtual hosts x 4 chips) drives the same public prover with
    axis=('host', 'chip'); proof is bit-identical to single-device.  The
    collectives flatten over both axes (PartitionSpec tuple-axis), which
    is exactly how a real pod slice shards after jax.distributed init."""
    from ultragroth_tpu.io.fieldenc import array_to_ints
    from ultragroth_tpu.io.wtns import parse_wtns
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.protocol import groth16 as g16
    from ultragroth_tpu.protocol.prover import JaxGroth16Prover

    zk = parse_groth16_zkey(np.frombuffer(golden_zkey_bytes, np.uint8))
    wt = parse_wtns(np.frombuffer(golden_wtns_bytes, np.uint8))
    devs = np.array(jax.devices())[:8].reshape(2, 4)
    with Mesh(devs, ("host", "chip")) as mesh:
        sharded = JaxGroth16Prover(zk, mesh=mesh, axis=("host", "chip"))
        proof = sharded.prove(wt.values, r=R_BLIND, s=S_BLIND)

    single = JaxGroth16Prover(zk).prove(wt.values, r=R_BLIND, s=S_BLIND)
    assert proof.to_json_dict() == single.to_json_dict()

    vk = g16.VerificationKey.from_json_dict(golden_vk_json)
    publics = array_to_ints(wt.values[1:zk.n_public + 1])
    assert g16.verify(proof, publics, vk)


def test_make_mesh_single_process():
    from ultragroth_tpu.parallel.mesh import make_host_chip_mesh, axis_size
    mesh = make_host_chip_mesh(8)
    assert mesh.axis_names == ("host", "chip")
    assert mesh.shape["host"] == 1 and mesh.shape["chip"] == 8
    assert axis_size(mesh, ("host", "chip")) == 8
    assert axis_size(mesh, "chip") == 8


def test_distributed_init_noop(monkeypatch):
    from ultragroth_tpu.parallel import mesh as pmesh
    monkeypatch.delenv("ULTRAGROTH_COORDINATOR", raising=False)
    assert pmesh.distributed_init() is False


def test_mesh_prover_ultragroth_bitexact():
    """UltraGroth mesh twin: sharded 2-round prove == single-device,
    and the 5-pairing verify passes.  Circuit sized so the quotient
    domain splits across 8 devices (domain >= 64)."""
    from ultragroth_tpu.io.wtns import parse_wtns
    from ultragroth_tpu.io.zkey import parse_ultragroth_zkey
    from ultragroth_tpu.protocol import ultragroth as ug
    from ultragroth_tpu.protocol.prover import JaxUltraGrothProver
    from ultragroth_tpu.testkit.circuits import LookupCircuit
    from ultragroth_tpu.testkit.setup import ultragroth_setup

    rng = random.Random(11)
    chunks = [rng.randrange(8) for _ in range(40)]
    circ = LookupCircuit(chunk_values=chunks, table_size=8)
    setup = ultragroth_setup(circ.r1cs, circ.round_indexes,
                             circ.final_indexes, circ.rand_indx, seed=3)
    zk = parse_ultragroth_zkey(np.frombuffer(setup.zkey_bytes, np.uint8))
    wt = parse_wtns(np.frombuffer(circ.uwtns_bytes(), np.uint8))
    assert zk.domain_size >= 64, zk.domain_size

    R0 = 0xAAAA567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678
    with _mesh() as mesh:
        sharded = JaxUltraGrothProver(zk, mesh=mesh)
        proof, w_f = sharded.prove(wt.values, wt, r0=R0, r=R_BLIND,
                                   s=S_BLIND)
    single, w_s = JaxUltraGrothProver(zk).prove(wt.values, wt, r0=R0,
                                                r=R_BLIND, s=S_BLIND)
    assert proof.to_json_dict() == single.to_json_dict()
    assert w_f == w_s

    vk = ug.UltraGrothVerificationKey.from_json_dict(setup.vk_json)
    publics = ug.public_signals(w_f, zk.n_public, zk.rand_indx)
    assert ug.verify(proof, publics, vk)
