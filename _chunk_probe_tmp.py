import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from hibayes_tpu.engine import gibbs as G
from hibayes_tpu.ops import blockgibbs as bg
from bench import _sim_geno, _sim_pheno

n, m, block = 16384, 500_000, 128
rng = np.random.default_rng(0)
M = _sim_geno(rng, n, m)
y = _sim_pheno(rng, M)
pi = np.array([0.95, 0.02, 0.02, 0.01]); fold = np.array([0.0, 1e-4, 1e-3, 1e-2])
data = G.prepare_gibbs_data(y, M, block=block, dtype=jnp.float32, geno_dtype="int8", fold=fold)
pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
spec = G.GibbsSpec(model="BayesR", n=n, m=m, m_pad=int(data.xpx.shape[0]), block=block,
    nc=0, nlevels=(), n_fold=4, niter=20, nburn=10, thin=5,
    nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
    dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
    s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, use_pallas=True)
state = G.init_state(spec, data, pr, pi)
key = jax.random.PRNGKey(0)

for cn in (2048, 4096, 8192, 16384):
    bg.MC_CHUNK_N = cn
    C = bg._pick_chunk(n)
    vm_ok = bg.supports_mc_tc(spec, n, 1, jnp.float32, geno_itemsize=1)
    full = jax.jit(partial(G.one_iteration, spec))
    try:
        st = jax.block_until_ready(full(data, key, state))
        t0 = time.time()
        for _ in range(10):
            st = full(data, key, st)
        jax.block_until_ready(st)
        dt = (time.time() - t0) / 10
        print(f"MC_CHUNK_N={cn} (C={C}, mc_tc={vm_ok}): {dt*1e3:.1f} ms/iter "
              f"({m/dt/1e6:.2f}M upd/s)", flush=True)
    except Exception as e:
        print(f"MC_CHUNK_N={cn}: FAILED {type(e).__name__}", flush=True)
    full._clear_cache() if hasattr(full, "_clear_cache") else None
