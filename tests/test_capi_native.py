"""Drive the native C ABI (libultragroth.so) in-process via ctypes.

The shim embeds CPython; when loaded into an already-running interpreter,
PyGILState_Ensure attaches to THIS interpreter, so the test can both call
the extern-C symbols exactly as an FFI consumer would AND observe the
Python-side state (zkey parse counter) to prove the create-once/prove-many
amortization contract (/root/reference/src/prover.h:80-163).
"""
from __future__ import annotations

import ctypes
import json
import pathlib

import pytest

from ultragroth_tpu import api
from ultragroth_tpu import constants as C
from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.io.binfile import pack_binfile
from ultragroth_tpu.testkit.circuits import square_chain_circuit
from ultragroth_tpu.testkit.setup import groth16_setup

LIB = pathlib.Path(__file__).resolve().parent.parent / \
    "ultragroth_tpu" / "_native" / "libultragroth.so"

pytestmark = pytest.mark.skipif(not LIB.exists(),
                                reason="native lib not built")

ULL = ctypes.c_ulonglong


@pytest.fixture(scope="module")
def lib():
    return ctypes.CDLL(str(LIB))


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    td = tmp_path_factory.mktemp("capi")
    r1cs, wtns = square_chain_circuit(5, seed=31)
    setup = groth16_setup(r1cs, seed=32)
    zkey = td / "c.zkey"
    zkey.write_bytes(setup.zkey_bytes)
    sec1 = ((32).to_bytes(4, "little") + R.to_bytes(32, "little")
            + r1cs.n_vars.to_bytes(4, "little"))
    wtns_bytes = pack_binfile(C.WTNS_MAGIC, 2,
                              [(1, sec1), (2, wtns.tobytes())])
    return zkey, wtns_bytes, setup.vk_json


def _prove(lib, fn, handle, wtns_bytes, proof_cap=4096, public_cap=4096):
    proof = ctypes.create_string_buffer(proof_cap)
    public = ctypes.create_string_buffer(public_cap)
    err = ctypes.create_string_buffer(512)
    psz, usz = ULL(proof_cap), ULL(public_cap)
    rc = fn(handle, wtns_bytes, ULL(len(wtns_bytes)), proof,
            ctypes.byref(psz), public, ctypes.byref(usz), err, ULL(512))
    return rc, proof.value.decode(), public.value.decode(), psz, usz, err


def test_handle_create_prove_twice_destroy(lib, fixture_files, monkeypatch):
    zkey_path, wtns_bytes, vk_json = fixture_files

    # counter: prove must NOT re-parse the zkey after create
    calls = {"n": 0}
    real_parse = api.parse_groth16_zkey

    def counting_parse(buf):
        calls["n"] += 1
        return real_parse(buf)

    monkeypatch.setattr(api, "parse_groth16_zkey", counting_parse)

    obj = ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    rc = lib.groth16_prover_create_zkey_file(
        ctypes.byref(obj), str(zkey_path).encode(), err, ULL(512))
    assert rc == 0, err.value
    assert obj.value
    assert calls["n"] == 1

    for _ in range(2):
        rc, proof, public, _, _, err2 = _prove(
            lib, lib.groth16_prover_prove, obj, wtns_bytes)
        assert rc == 0, err2.value
        assert api.groth16_verify(proof, public, json.dumps(vk_json)) \
            == api.VERIFIER_VALID_PROOF
    assert calls["n"] == 1  # create-once/prove-many: zkey parsed exactly once

    lib.groth16_prover_destroy(obj)


def test_handle_short_buffer_protocol(lib, fixture_files):
    zkey_path, wtns_bytes, _ = fixture_files
    obj = ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    zk_bytes = zkey_path.read_bytes()
    rc = lib.groth16_prover_create(ctypes.byref(obj), zk_bytes,
                                   ULL(len(zk_bytes)), err, ULL(512))
    assert rc == 0, err.value
    rc, _, _, psz, usz, _ = _prove(lib, lib.groth16_prover_prove, obj,
                                   wtns_bytes, proof_cap=8)
    assert rc == api.PROVER_ERROR_SHORT_BUFFER
    assert psz.value > 8 and usz.value > 0     # required sizes written back
    # retry with the announced sizes succeeds
    rc, proof, _, _, _, _ = _prove(lib, lib.groth16_prover_prove, obj,
                                   wtns_bytes, proof_cap=psz.value,
                                   public_cap=usz.value)
    assert rc == 0 and proof.startswith("{")
    lib.groth16_prover_destroy(obj)


def test_oneshot_zkey_file_and_sizes(lib, fixture_files):
    zkey_path, wtns_bytes, vk_json = fixture_files
    proof = ctypes.create_string_buffer(4096)
    public = ctypes.create_string_buffer(4096)
    err = ctypes.create_string_buffer(512)
    psz, usz = ULL(4096), ULL(4096)
    rc = lib.groth16_prover_zkey_file(
        str(zkey_path).encode(), wtns_bytes, ULL(len(wtns_bytes)), proof,
        ctypes.byref(psz), public, ctypes.byref(usz), err, ULL(512))
    assert rc == 0, err.value
    assert api.groth16_verify(proof.value.decode(), public.value.decode(),
                              json.dumps(vk_json)) == api.VERIFIER_VALID_PROOF

    # void-returning proof size + file-path public size
    sz = ULL(0)
    lib.groth16_proof_size.restype = None
    lib.groth16_proof_size(ctypes.byref(sz))
    assert sz.value == C.PROOF_BUFFER_MIN_SIZE
    psz2 = ULL(0)
    rc = lib.groth16_public_size_for_zkey_file(
        str(zkey_path).encode(), ctypes.byref(psz2), err, ULL(512))
    assert rc == 0 and psz2.value > 0

    # error path: missing file -> PROVER_ERROR with a message
    obj = ctypes.c_void_p()
    rc = lib.groth16_prover_create_zkey_file(
        ctypes.byref(obj), b"/nonexistent/x.zkey", err, ULL(512))
    assert rc == api.PROVER_ERROR and err.value


def test_public_headers_compile_and_link(tmp_path):
    """native/include/ultragroth/*.h must compile standalone and link
    against the shim exactly as a packaged consumer would
    (scripts/package_library.sh bundle layout)."""
    import shutil
    import subprocess
    if shutil.which("cc") is None and shutil.which("g++") is None:
        pytest.skip("no C compiler")
    cc = shutil.which("cc") or shutil.which("g++")
    repo = pathlib.Path(__file__).resolve().parent.parent
    inc = repo / "native" / "include"
    libdir = LIB.parent
    src = tmp_path / "consumer.c"
    src.write_text(
        '#include "ultragroth/prover.h"\n'
        '#include "ultragroth/verifier.h"\n'
        "int main(void) {\n"
        "    unsigned long long n = 0, m = 0;\n"
        "    groth16_proof_size(&n);\n"
        "    ultra_groth_proof_size(&m);\n"
        "    return (n == 810 && m == 1400) ? 0 : 1;\n"
        "}\n")
    exe = tmp_path / "consumer"
    subprocess.run(
        [cc, str(src), f"-I{inc}", f"-L{libdir}", "-lultragroth",
         f"-Wl,-rpath,{libdir}", "-o", str(exe)],
        check=True, capture_output=True)
    res = subprocess.run([str(exe)], capture_output=True)
    assert res.returncode == 0
