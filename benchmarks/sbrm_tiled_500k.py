"""sbrm tiled-sparse LD at m=500,000 on one chip.

Measured (tunneled v5e, 2026-08-20): 103 ms/iteration -> 4.8M SNP-updates/s
(BayesCpi, 9-tile banded LD, 2.3 GB tile store, rejection guard on).
"""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from hibayes_tpu.data.sparse_ld import TiledSparseLD
from hibayes_tpu.engine import gibbs as G, sgibbs as SG

T, m, K = 128, 500_000, 9
nbr = -(-m // T)
rho = 0.9
idx = np.arange(T)
motifs = [(rho ** np.abs(idx[:, None] - (idx[None, :] + d * T))).astype(np.float32)
          for d in range(K // 2 + 1)]
half = K // 2
col_idx = np.zeros((nbr, K), np.int32); valid = np.zeros((nbr, K), bool)
tiles = np.zeros((nbr, K, T, T), np.float32)
for i in range(nbr):
    js = [i] + [j for off in range(1, half + 1) for j in (i - off, i + off) if 0 <= j < nbr]
    for k, j in enumerate(js):
        col_idx[i, k] = j; valid[i, k] = True
        tiles[i, k] = motifs[abs(j - i)] if j >= i else motifs[abs(j - i)].T
ld = TiledSparseLD(tile=T, m=m, col_idx=col_idx, valid=valid, tiles=tiles,
                   nnz_col=np.full(m, K * T, np.int64))
rng = np.random.default_rng(0)
ngw = 50_000
b_true = (rng.random(m) < 0.01) * rng.normal(0, 0.05, m)
Bm = ld.matvec(b_true)
ss = np.column_stack([np.full(m, 0.3), Bm, np.full(m, 1 / np.sqrt(ngw)), np.full(m, ngw)])
data, n_eff, vary, nvar0, seg_sizes, seg_real = SG.prepare_sgibbs_data(
    ss, ld, fold=np.array([0., 1.]), block=T, dtype=jnp.float32)
pr = G.resolve_priors(None, float(np.sum(np.asarray(ld.diag))), 0.95, nr=0, vary=vary)
spec = G.GibbsSpec(model="BayesCpi", n=n_eff, m=m, m_pad=int(sum(seg_sizes)), block=T,
    nc=0, nlevels=(), n_fold=2, niter=20, nburn=10, thin=5, nvar0=nvar0,
    dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
    s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, vargl_strict_pos=True,
    real_excl_nvar0=True, reject_guard=True, vary=vary,
    seg_sizes=seg_sizes, seg_real=seg_real, use_pallas=True)
st = SG.init_s_state(spec, data, pr, np.array([0.95, 0.05]))
key = jax.random.PRNGKey(1)
step = jax.jit(partial(SG.one_s_iteration, spec))
t0 = time.time(); st = jax.block_until_ready(step(data, key, st))
print(f"compile+1st: {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); N = 20
for _ in range(N):
    st = step(data, key, st)
st = jax.block_until_ready(st)
dt = (time.time() - t0) / N
print(f"transposed tiled kernel, m=500k: {dt*1e3:.1f} ms/iter -> "
      f"{m/dt/1e6:.1f}M SNP-updates/s; vara={float(st.vara):.4f} "
      f"vare={float(st.vare):.4f}", flush=True)
