"""libultragroth_remote: the mobile-client twin, end-to-end vs the server.

The reference packages an on-device prover for phones
(/root/reference/scripts/create_xcframework.sh); the TPU framework's
mobile deliverable is a thin C client exporting the SAME prover.h ABI
but fetching proofs from the proof server (native/ultragroth_remote.c).
This test drives the compiled .so through ctypes against a live server
on the golden circuit (oracle backend: no XLA compiles) and checks the
buffer-size retry protocol plus the produced proof.
"""
import ctypes
import json
import pathlib
import socket
import threading
import time

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
LIB = REPO / "ultragroth_tpu" / "_native" / "libultragroth_remote.so"
TESTDATA = pathlib.Path("/root/reference/testdata")

pytestmark = pytest.mark.skipif(not LIB.exists(),
                                reason="make -C native first")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    from ultragroth_tpu.server import serve
    port = _free_port()
    _fp, httpd = serve([str(TESTDATA / "circuit_final.zkey")], port,
                       backend="oracle")
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    t0 = time.time()
    while time.time() - t0 < 10:          # wait for the socket
        try:
            socket.create_connection(("127.0.0.1", port), 1).close()
            break
        except OSError:
            time.sleep(0.05)
    yield port
    httpd.shutdown()


def test_remote_prove_golden(server, monkeypatch, golden_vk_json,
                             golden_wtns_bytes):
    monkeypatch.setenv("ULTRAGROTH_SERVER", f"127.0.0.1:{server}")
    lib = ctypes.CDLL(str(LIB))
    err = ctypes.create_string_buffer(256)

    obj = ctypes.c_void_p()
    rc = lib.groth16_prover_create_zkey_file(
        ctypes.byref(obj), str(TESTDATA / "circuit_final.zkey").encode(),
        err, ctypes.c_ulonglong(256))
    assert rc == 0, err.value

    wtns = golden_wtns_bytes
    # short-buffer retry protocol (prover.h contract)
    proof_sz = ctypes.c_ulonglong(8)
    pub_sz = ctypes.c_ulonglong(8)
    small = ctypes.create_string_buffer(8)
    rc = lib.groth16_prover_prove(
        obj, wtns, ctypes.c_ulonglong(len(wtns)),
        small, ctypes.byref(proof_sz), small, ctypes.byref(pub_sz),
        err, ctypes.c_ulonglong(256))
    assert rc == 2, (rc, err.value)       # PROVER_ERROR_SHORT_BUFFER
    assert proof_sz.value > 8

    proof_buf = ctypes.create_string_buffer(int(proof_sz.value) + 4096)
    pub_buf = ctypes.create_string_buffer(4096)
    proof_sz = ctypes.c_ulonglong(len(proof_buf))
    pub_sz = ctypes.c_ulonglong(len(pub_buf))
    rc = lib.groth16_prover_prove(
        obj, wtns, ctypes.c_ulonglong(len(wtns)),
        proof_buf, ctypes.byref(proof_sz), pub_buf, ctypes.byref(pub_sz),
        err, ctypes.c_ulonglong(256))
    assert rc == 0, err.value
    lib.groth16_prover_destroy(obj)

    proof = json.loads(proof_buf.value.decode())
    publics = json.loads(pub_buf.value.decode())
    from ultragroth_tpu.protocol import groth16 as g16
    vk = g16.VerificationKey.from_json_dict(golden_vk_json)
    assert g16.verify(g16.Proof.from_json_dict(proof),
                      [int(x) for x in publics], vk)


def test_remote_create_unknown_circuit(server, monkeypatch):
    monkeypatch.setenv("ULTRAGROTH_SERVER", f"127.0.0.1:{server}")
    lib = ctypes.CDLL(str(LIB))
    err = ctypes.create_string_buffer(256)
    obj = ctypes.c_void_p()
    # create succeeds (liveness only) but prove against an unknown slot
    # must surface the server's error
    rc = lib.groth16_prover_create_zkey_file(
        ctypes.byref(obj), b"/nope/unknown.zkey", err,
        ctypes.c_ulonglong(256))
    assert rc == 0, err.value
    buf = ctypes.create_string_buffer(4096)
    sz1 = ctypes.c_ulonglong(4096)
    sz2 = ctypes.c_ulonglong(4096)
    rc = lib.groth16_prover_prove(obj, b"xx", ctypes.c_ulonglong(2),
                                  buf, ctypes.byref(sz1), buf,
                                  ctypes.byref(sz2), err,
                                  ctypes.c_ulonglong(256))
    assert rc == 1, (rc, err.value)
    lib.groth16_prover_destroy(obj)
