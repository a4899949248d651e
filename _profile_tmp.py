import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from hibayes_tpu.engine import gibbs as G
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

def timeit(f, *a, N=10):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(N):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / N, out

full = jax.jit(partial(G.one_iteration, spec))
t_full, state2 = timeit(full, data, key, state)
print(f"full iteration: {t_full*1e3:.1f} ms")

# pre-sweep only
pre_f = jax.jit(lambda d, k, s: G._pre_sweep(spec, d, jax.random.fold_in(k, s.it), s)["rnd"][0][0])
t_pre, _ = timeit(pre_f, data, key, state)
print(f"pre-sweep (RNG streams etc.): {t_pre*1e3:.1f} ms")

# sweep via the K=1 transposed chunked kernel, everything prepared outside
from hibayes_tpu.ops import blockgibbs
def sweep_only(d, k, s):
    pre = G._pre_sweep(spec, d, jax.random.fold_in(k, s.it), s)
    consts_b = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], pre["consts"])
    out = blockgibbs.sweep_mc_tc(spec, consts_b, d.X_blocks, d.W_blocks, d.xpx, d.vx,
        pre["vei"][None], s.g[None], *(r[None] for r in pre["rnd"]),
        pre["vargL_in"][None], pre["yadj"][None], pre["u"][None])
    return out[0][0]
sw = jax.jit(sweep_only)
t_sw, _ = timeit(sw, data, key, state)
print(f"pre+sweep: {t_sw*1e3:.1f} ms -> sweep approx {1e3*(t_sw - t_pre):.1f} ms, post approx {1e3*(t_full - t_sw):.1f} ms")
