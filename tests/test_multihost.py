"""2-process jax.distributed smoke test on CPU (Gloo collectives).

Exercises the multi-host path end-to-end (VERDICT: previously untested):
each process decodes ONLY its own row shard of a PLINK fileset
(`load_plink_host_sharded` -> row-range .bed decode with global-major
imputation), assembles the global sharded genotype, and runs a short
n-sharded chain over the 2-process mesh.  Both processes must agree with
each other and with a single-process reference run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy shard_map/interpret compiles: full lane only


from hibayes_tpu.data import plink

_WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); port = sys.argv[2]; bfile = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from hibayes_tpu.parallel.distributed import (
    init_multihost, load_plink_host_sharded, process_row_range)
nproc, me = init_multihost(f"localhost:{port}", 2, pid)
assert nproc == 2 and me == pid
import numpy as np
import jax.numpy as jnp
from hibayes_tpu.parallel.mesh import make_mesh
mesh = make_mesh(shape=(8, 1))
fileset, geno = load_plink_host_sharded(bfile, mesh)
n = geno.shape[0]
r0, rc = process_row_range(n, mesh)
assert fileset["geno"].values.shape[0] == rc
# replicated checksum of the GLOBAL sharded genotype
with mesh:
    csum = jax.jit(lambda g: jnp.sum(g.astype(jnp.float64) * 1.0003))(geno)
# short n-sharded chain over the 2-process global mesh (every process builds
# identical inputs; jax.Array sharding places the data)
from hibayes_tpu.engine import gibbs as G
from hibayes_tpu.data.plink import read_plink
M = np.asarray(read_plink(bfile)["geno"].values, dtype=np.float64)
rng = np.random.default_rng(0)
y = M @ rng.normal(0, 0.2, M.shape[1]) + rng.normal(0, 1, n)
pi = np.array([0.95, 0.05])
data = G.prepare_gibbs_data(y, M, block=8, dtype=jnp.float64)
pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
spec = G.GibbsSpec(model="BayesCpi", n=n, m=M.shape[1],
    m_pad=int(data.xpx.shape[0]), block=8, nc=0, nlevels=(), n_fold=2,
    niter=40, nburn=20, thin=5,
    nvar0=int((np.asarray(data.vx)[:M.shape[1]] == 0).sum()),
    dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
    s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0)
state, samples, extras = G.run_chain(spec, data, pr, pi, seed=5, mesh=mesh)
vg = float(np.mean(np.asarray(samples["Vg"])))
print(json.dumps({"pid": pid, "rows": [int(r0), int(rc)],
                  "csum": float(csum), "vg": vg}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_host_sharded_load(tmp_path):
    rng = np.random.default_rng(4)
    g = rng.integers(0, 3, size=(16, 24)).astype(np.int8)
    g[rng.random(g.shape) < 0.1] = -9
    (tmp_path / "t.bed").write_bytes(plink.encode_bed_bytes(g))
    with open(tmp_path / "t.bim", "w") as f:
        for j in range(24):
            f.write(f"1\tM{j}\t0\t{j + 1}\tA\tG\n")
    with open(tmp_path / "t.fam", "w") as f:
        for i in range(16):
            f.write(f"F{i}\tI{i}\t0\t0\t0\t-9\n")
    bfile = str(tmp_path / "t")

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), bfile],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    import json

    recs = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        recs[rec["pid"]] = rec

    # contiguous complementary halves
    assert recs[0]["rows"] == [0, 8]
    assert recs[1]["rows"] == [8, 8]
    # replicated checksum identical across processes AND equal to the
    # full single-process decode (global-major imputation included)
    full = plink.read_plink(bfile)["geno"].values
    expect = float(np.sum(np.asarray(full, dtype=np.float64) * 1.0003))
    assert recs[0]["csum"] == recs[1]["csum"]
    np.testing.assert_allclose(recs[0]["csum"], expect, rtol=1e-12)
    # the distributed chain ran and both processes agree on its output
    assert recs[0]["vg"] == recs[1]["vg"]
    assert np.isfinite(recs[0]["vg"]) and recs[0]["vg"] > 0
