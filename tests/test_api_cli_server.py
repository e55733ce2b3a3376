"""C-API-parity surface, CLI twins, and the proof server."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from ultragroth_tpu import api
from ultragroth_tpu import constants as C
from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.io.binfile import pack_binfile
from ultragroth_tpu.testkit.circuits import LookupCircuit, square_chain_circuit
from ultragroth_tpu.testkit.setup import groth16_setup, ultragroth_setup


@pytest.fixture(scope="module")
def small_groth16():
    r1cs, wtns = square_chain_circuit(5, seed=11)
    setup = groth16_setup(r1cs, seed=12)
    sec1 = ((32).to_bytes(4, "little") + R.to_bytes(32, "little")
            + r1cs.n_vars.to_bytes(4, "little"))
    wtns_bytes = pack_binfile(C.WTNS_MAGIC, 2, [(1, sec1), (2, wtns.tobytes())])
    return setup, wtns_bytes


@pytest.fixture(scope="module")
def small_ultra():
    circ = LookupCircuit(chunk_values=[1, 0, 1], table_size=2)
    setup = ultragroth_setup(circ.r1cs, circ.round_indexes,
                             circ.final_indexes, circ.rand_indx, seed=21)
    return circ, setup


def test_api_sizes_and_errors(small_groth16):
    setup, wtns_bytes = small_groth16
    assert api.groth16_proof_size() == 810
    assert api.ultra_groth_proof_size() == 1400
    size = api.groth16_public_size_for_zkey_buf(setup.zkey_bytes)
    assert size == 1 * 82 + 4
    with pytest.raises(Exception):
        api.groth16_public_size_for_zkey_buf(b"nope")


def test_api_oneshot_prove_verify(small_groth16):
    setup, wtns_bytes = small_groth16
    proof_json, public_json = api.groth16_prover(
        setup.zkey_bytes, wtns_bytes, backend="oracle")
    vk_json = json.dumps(setup.vk_json)
    assert api.groth16_verify(proof_json, public_json, vk_json) \
        == api.VERIFIER_VALID_PROOF
    bad = json.dumps([str(int(json.loads(public_json)[0]) + 1)])
    assert api.groth16_verify(proof_json, bad, vk_json) \
        == api.VERIFIER_INVALID_PROOF
    assert api.groth16_verify("junk", public_json, vk_json) \
        == api.VERIFIER_ERROR


def test_api_invalid_witness_length(small_groth16):
    setup, wtns_bytes = small_groth16
    prover = api.Groth16Prover(setup.zkey_bytes, backend="oracle")
    # corrupt the witness count
    short = bytearray(wtns_bytes)
    sec1 = ((32).to_bytes(4, "little") + R.to_bytes(32, "little")
            + (3).to_bytes(4, "little"))
    bad = pack_binfile(C.WTNS_MAGIC, 2,
                       [(1, sec1), (2, b"\0" * (3 * 32))])
    with pytest.raises(api.InvalidWitnessLength):
        prover.prove(bad)


def test_api_ultra_oneshot(small_ultra):
    circ, setup = small_ultra
    proof_json, public_json = api.ultra_groth_prover(
        setup.zkey_bytes, circ.uwtns_bytes(), backend="oracle")
    vk_json = json.dumps(setup.vk_json)
    assert api.ultra_groth_verify(proof_json, public_json, vk_json) \
        == api.VERIFIER_VALID_PROOF
    # publics exclude the rand signal
    assert json.loads(public_json) == [str(circ.pub_x)]


def test_cli_roundtrip(tmp_path, small_groth16):
    from ultragroth_tpu.cli import main as cli_main
    setup, wtns_bytes = small_groth16
    zkey = tmp_path / "c.zkey"
    wtns = tmp_path / "w.wtns"
    vk = tmp_path / "vk.json"
    zkey.write_bytes(setup.zkey_bytes)
    wtns.write_bytes(wtns_bytes)
    vk.write_text(json.dumps(setup.vk_json))
    proof, public = tmp_path / "p.json", tmp_path / "pub.json"
    assert cli_main(["prove", str(zkey), str(wtns), str(proof), str(public),
                     "--backend", "oracle"]) == 0
    assert cli_main(["verify", str(vk), str(public), str(proof)]) == 0
    # tamper
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([str(int(json.loads(public.read_text())[0]) + 1)]))
    assert cli_main(["verify", str(vk), str(bad), str(proof)]) == 1


def test_cli_setup_ultra_roundtrip(tmp_path):
    """setup-ultra -> prove-ultra -> verify-ultra, all through the CLI."""
    from ultragroth_tpu.cli import main as cli_main
    zkey = tmp_path / "u.zkey"
    vk = tmp_path / "u_vk.json"
    uwtns = tmp_path / "u.uwtns"
    assert cli_main(["setup-ultra", str(zkey), "--vk", str(vk),
                     "--uwtns", str(uwtns), "--chunks", "6",
                     "--table-size", "4", "--seed", "3"]) == 0
    proof, public = tmp_path / "p.json", tmp_path / "pub.json"
    assert cli_main(["prove-ultra", str(zkey), str(uwtns), str(proof),
                     str(public), "--backend", "oracle"]) == 0
    assert cli_main(["verify-ultra", str(vk), str(public), str(proof)]) == 0
    bad = tmp_path / "bad.json"
    pub0 = json.loads(public.read_text())
    bad.write_text(json.dumps([str(int(pub0[0]) + 1)] + pub0[1:]))
    assert cli_main(["verify-ultra", str(vk), str(bad), str(proof)]) == 1


def test_server_status_machine(tmp_path, small_groth16):
    from ultragroth_tpu.server import serve
    setup, wtns_bytes = small_groth16
    zkey = tmp_path / "circ.zkey"
    zkey.write_bytes(setup.zkey_bytes)
    fp, httpd = serve([str(zkey)], port=0, backend="oracle")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        st = json.load(urllib.request.urlopen(f"{base}/status"))
        assert st["status"] == "ready"
        req = urllib.request.Request(
            f"{base}/input/circ", data=wtns_bytes,
            headers={"Content-Type": "application/octet-stream"})
        assert urllib.request.urlopen(req).status == 200
        for _ in range(200):
            st = json.load(urllib.request.urlopen(f"{base}/status"))
            if st["status"] not in ("busy", "ready"):
                break
            time.sleep(0.1)
        assert st["status"] == "success", st
        vk_json = json.dumps(setup.vk_json)
        assert api.groth16_verify(st["proof"], st["pubData"], vk_json) \
            == api.VERIFIER_VALID_PROOF
        # unknown circuit -> 404
        req = urllib.request.Request(f"{base}/input/nope", data=b"{}")
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
        # cancel + start/stop endpoints respond
        for path in ("/cancel", "/start", "/stop"):
            req = urllib.request.Request(f"{base}{path}", data=b"")
            assert urllib.request.urlopen(req).status == 200
    finally:
        httpd.shutdown()


def test_prove_abort_check(small_groth16):
    """Cooperative cancel: an abort_check that fires stops the prove at
    the next phase boundary with ProveAborted (jax backend)."""
    from ultragroth_tpu.trace import ProveAborted
    setup, wtns_bytes = small_groth16
    prover = api.Groth16Prover(setup.zkey_bytes, backend="jax")
    with pytest.raises(ProveAborted):
        prover.prove(wtns_bytes, abort_check=lambda: True)
    # a never-firing check leaves the prove intact
    proof_json, public_json = prover.prove(wtns_bytes,
                                           abort_check=lambda: False)
    vk_json = json.dumps(setup.vk_json)
    assert api.groth16_verify(proof_json, public_json, vk_json) \
        == api.VERIFIER_VALID_PROOF


def test_server_ultragroth_autodetect(tmp_path, small_ultra):
    """The server must preload UltraGroth zkeys and prove from a posted
    .uwtns (protocol auto-detection, rand-signal-excluded publics)."""
    from ultragroth_tpu.server import serve
    circ, setup = small_ultra
    zkey = tmp_path / "ug.zkey"
    zkey.write_bytes(setup.zkey_bytes)
    fp, httpd = serve([str(zkey)], port=0, backend="oracle")
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/input/ug", data=circ.uwtns_bytes(),
            headers={"Content-Type": "application/octet-stream"})
        assert urllib.request.urlopen(req).status == 200
        for _ in range(300):
            st = json.load(urllib.request.urlopen(f"{base}/status"))
            if st["status"] not in ("busy", "ready"):
                break
            time.sleep(0.1)
        assert st["status"] == "success", st
        vk_json = json.dumps(setup.vk_json)
        assert api.ultra_groth_verify(st["proof"], st["pubData"], vk_json) \
            == api.VERIFIER_VALID_PROOF
        assert json.loads(st["pubData"]) == [str(circ.pub_x)]
    finally:
        httpd.shutdown()
