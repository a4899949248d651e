"""Profile one ibrm one_iteration step: per-op device totals from a
jax.profiler trace (this is how the m=500k copy_select_fusion regression
was found).  Usage: python benchmarks/profile_step.py [m] [n]."""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from benchmarks.sharded_path_500k import _sim_geno
from hibayes_tpu.engine import gibbs as G


def build(n, m, block=128, model="BayesR"):
    rng = np.random.default_rng(0)
    M = _sim_geno(rng, n, m)
    b = rng.normal(0, 0.05, m).astype(np.float32)
    y = rng.normal(0, 1, n).astype(np.float32)
    for j0 in range(0, m, 8192):
        y += M[:, j0:j0 + 8192].astype(np.float32) @ b[j0:j0 + 8192]
    pi = np.array([0.95, 0.02, 0.02, 0.01])
    fold = np.array([0.0, 1e-4, 1e-3, 1e-2])
    data = G.prepare_gibbs_data(y, M, block=block, dtype=jnp.float32,
                                geno_dtype="int8", fold=fold)
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model=model, n=int(data.y.shape[0]), n_real=n,
        m=m, m_pad=int(data.xpx.shape[0]), block=block,
        nc=0, nlevels=(), n_fold=len(pi), niter=100, nburn=50, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, use_pallas=True,
    )
    st0 = G.init_state(spec, data, pr, pi)
    return spec, data, st0


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    spec, data, st0 = build(n, m)
    key = jax.random.PRNGKey(1)
    step = jax.jit(partial(G.one_iteration, spec))
    st = jax.block_until_ready(step(data, key, st0))
    st = jax.block_until_ready(step(data, key, st))
    t0 = time.time()
    for _ in range(5):
        st = step(data, key, st)
    jax.block_until_ready(st)
    print(f"m={m}: {(time.time()-t0)/5*1e3:.1f} ms/iter")

    with jax.profiler.trace("/tmp/prof_bayesr"):
        for _ in range(3):
            st = step(data, key, st)
        jax.block_until_ready(st)

    traces = sorted(glob.glob("/tmp/prof_bayesr/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace found")
        return
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            agg[ev["name"]] += ev["dur"]
            cnt[ev["name"]] += 1
    for name, tot in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{tot/1e3:10.2f} ms  x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
