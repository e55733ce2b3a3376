#!/bin/bash
# Round-5 serial CPU queue: fixed-base MSM tests, then the byte fixture.
cd /root/repo
echo "=== fixed-base msm tests ==="
timeout 7200 python -m pytest tests/test_ntt_msm.py -q -k "fixed or batch_inv" 2>&1 | tail -8
echo "=== fixture generation ==="
timeout 3600 python - << 'PYEOF' 2>&1 | tail -6
import jax
jax.config.update("jax_platforms", "cpu")
import pathlib
from ultragroth_tpu.runtime import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir("/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from ultragroth_tpu import api

R_FIXED = int.from_bytes(bytes(range(1, 32)), "little")
S_FIXED = int.from_bytes(bytes(range(101, 132)), "little")
zk = open("/root/reference/testdata/circuit_final.zkey", "rb").read()
wt = open("/root/reference/testdata/witness.wtns", "rb").read()
p = api.Groth16Prover(zk)
proof_json, public_json = p.prove(wt, r=R_FIXED, s=S_FIXED)
open("/root/repo/tests/fixtures/golden_proof_pinned.json", "w").write(proof_json)
open("/root/repo/tests/fixtures/golden_public_pinned.json", "w").write(public_json)
print("proof bytes:", len(proof_json))
print("public:", public_json)
PYEOF
echo "=== queue done ==="
