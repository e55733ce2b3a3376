"""TRUE multi-process distributed runtime smoke test (SURVEY section 5.8).

tests/test_parallel.py covers the ('host', 'chip') sharding math on a
single-process virtual mesh; this file forms an actual 2-process
jax.distributed runtime (gloo CPU collectives standing in for DCN) through
the SAME bootstrap every entry point uses (`runtime.configure` ->
`parallel.mesh.distributed_init` from ULTRAGROTH_COORDINATOR/
NUM_PROCESSES/PROCESS_ID) and drives the sharded MSM + quotient pipeline
over a mesh whose 'host' axis really crosses process boundaries.

The reference has no distributed story at all (single-node ThreadPool,
/root/reference/src/groth16.cpp:70-148); this is the pod-slice launch
contract documented in parallel/mesh.py, exercised end to end.
"""
import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_CHILD = r"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from ultragroth_tpu.runtime import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir(os.path.join(os.getcwd(), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ultragroth_tpu.runtime import configure
configure()   # -> distributed_init() from the ULTRAGROTH_* env

import numpy as np
from ultragroth_tpu.io.fieldenc import array_to_ints, mont_decode_fr
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.field import fr
from ultragroth_tpu.oracle import curve as oc
from ultragroth_tpu.parallel.mesh import make_host_chip_mesh
from ultragroth_tpu.parallel.msm import msm_g1_sharded
from ultragroth_tpu.parallel.ntt import quotient_scalars_sharded
from ultragroth_tpu.constants import FQ_MODULUS

assert jax.process_count() == 2, jax.process_count()
mesh = make_host_chip_mesh()
assert mesh.shape["host"] == 2 and mesh.shape["chip"] == 4, mesh.shape

P = FQ_MODULUS
N = 64
pts = [oc.g1_mul(oc.G1, k + 2) for k in range(N)]
X = lb.ints_to_planes([(p[0] * (1 << 256)) % P for p in pts])
Y = lb.ints_to_planes([(p[1] * (1 << 256)) % P for p in pts])
inf = np.zeros(N, bool)
sc_ints = [(11 * i + 5) for i in range(N)]
scalars = lb.ints_to_planes(sc_ints)

with mesh:
    pt = msm_g1_sharded(X, Y, inf, scalars, mesh, axis=("host", "chip"),
                        c=8)
    # quotient over a 2^6 domain: 6 distributed NTT passes (all_to_all
    # transposes crossing the process boundary)
    F = fr()
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    a[15] &= 0x3FFF
    b[15] &= 0x3FFF
    h = quotient_scalars_sharded(F.to_mont(a), F.to_mont(b), 6, mesh,
                                 axis=("host", "chip"))

# digests: the MSM output is replicated (out_specs P()); h stays sharded
# across processes, so reduce it to a replicated per-plane sum (mod 2^32)
# instead of device_get-ing non-addressable shards
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec
h_sum = np.asarray(jax.jit(
    lambda t: jnp.sum(t, axis=1, dtype=jnp.uint32),
    out_shardings=NamedSharding(mesh, PartitionSpec()))(h))
expect = oc.g1_msm(pts, sc_ints)
digest = {
    "msm": [int(np.asarray(jax.device_get(l)).sum(dtype=np.uint64))
            for l in jax.tree_util.tree_leaves(pt)],
    "h": [int(v) for v in h_sum],
}

# cross-check h against the local UNSHARDED quotient pipeline
from ultragroth_tpu.ops.ntt import quotient_scalars
h_ref = quotient_scalars(F.to_mont(a), F.to_mont(b), 6)
assert [int(v) for v in np.asarray(h_ref).sum(axis=1, dtype=np.uint32)] \
    == digest["h"], "sharded quotient vs local pipeline"

# affine-decode the sharded MSM output and compare with the host oracle
from ultragroth_tpu.protocol.prover import xyzz_to_oracle_g1
assert xyzz_to_oracle_g1(jax.device_get(pt)) == expect, "msm vs oracle"
print("DIGEST " + json.dumps(digest), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_msm_and_quotient():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            ULTRAGROTH_COORDINATOR=f"127.0.0.1:{port}",
            ULTRAGROTH_NUM_PROCESSES="2",
            ULTRAGROTH_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=3000)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    digests = [json.loads(o.strip().splitlines()[-1].removeprefix("DIGEST "))
               for o in outs]
    assert digests[0] == digests[1], digests
