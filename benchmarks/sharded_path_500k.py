"""Measured anchor for the multi-chip projection (VERDICT r2 item 1c).

Runs the EXACT SNP-sharded code paths (`gibbs._sweep_snp_sharded`,
`sgibbs._tiled_sweep_snp_sharded`) on ONE chip with a (ind=1, snp=1) mesh:
the turn loop, lax.cond shard gating, psum merge and the shard-local fused
kernel all execute as they would per-turn on a pod slice — S=1 just makes
every turn the active one.  The multi-chip per-iteration time is then

    T_iter(S chips) ~= T_sharded_meas + S * t_psum(yadj or r_hat)

where the psum payload is n*4 bytes (ibrm yadj+u) or m_pad*4 (sbrm r_hat)
per turn over ICI (~1 GB/s/lane-scale: microseconds — negligible next to
the measured per-turn kernel time).  Compare against the unsharded kernel
path to quantify the turn-loop overhead (target <= 1.3x).

Usage: python benchmarks/sharded_path_500k.py [ibrm|sbrm|both]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from hibayes_tpu.engine import gibbs as G
from hibayes_tpu.engine import sgibbs as SG
from hibayes_tpu.parallel.mesh import make_mesh


def _sim_geno(rng, n, m, maf=0.3):
    p0 = (1 - maf) ** 2
    p1 = 2 * maf * (1 - maf)
    raw = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    out = np.ones((n, m), dtype=np.int8)
    out[raw < int(p0 * 256)] = 0
    out[raw >= int((p0 + p1) * 256)] = 2
    return out


def bench_ibrm(n=16384, m=500_000, block=128, model="BayesR", iters=10):
    rng = np.random.default_rng(0)
    M = _sim_geno(rng, n, m)
    b = rng.normal(0, 0.05, m).astype(np.float32)
    y = rng.normal(0, 1, n).astype(np.float32)
    for j0 in range(0, m, 8192):
        y += M[:, j0:j0 + 8192].astype(np.float32) @ b[j0:j0 + 8192]
    if model == "BayesR":
        pi = np.array([0.95, 0.02, 0.02, 0.01])
        fold = np.array([0.0, 1e-4, 1e-3, 1e-2])
    else:
        pi, fold = np.array([0.95, 0.05]), None
    data = G.prepare_gibbs_data(y, M, block=block, dtype=jnp.float32,
                                geno_dtype="int8", fold=fold)
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model=model, n=int(data.y.shape[0]), n_real=n,
        m=m, m_pad=int(data.xpx.shape[0]), block=block,
        nc=0, nlevels=(), n_fold=len(pi), niter=100, nburn=50, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0,
        use_pallas=jax.default_backend() != "cpu",
    )
    st0 = G.init_state(spec, data, pr, pi)
    key = jax.random.PRNGKey(1)

    # unsharded kernel path
    step_u = jax.jit(partial(G.one_iteration, spec))
    st = jax.block_until_ready(step_u(data, key, st0))
    st = jax.block_until_ready(step_u(data, key, st))
    t0 = time.time()
    for _ in range(iters):
        st = step_u(data, key, st)
    jax.block_until_ready(st)
    t_u = (time.time() - t0) / iters

    # sharded code path at S=1 (same chip, full turn-loop structure).
    # Data/state MUST be device_put with the mesh shardings first (as
    # run_chain does) — otherwise jit re-lays-out the 8 GB genotype on every
    # call, which over the tunnel costs seconds/iter and measures transfer,
    # not the sweep.
    from hibayes_tpu.parallel.mesh import shard_gibbs_data, shard_state

    mesh = make_mesh(1, shape=(1, 1))
    data_s = shard_gibbs_data(data, mesh)
    st_s = shard_state(st0, mesh)

    def step_s(data, key, state):
        pre = G._pre_sweep(spec, data, key, state)
        out = G._sweep_snp_sharded(
            spec, data, pre["consts"], pre["rnd"], pre["vei"], state.g,
            pre["vargL_in"], pre["yadj"], pre["u"], mesh,
        )
        return G._post_sweep(spec, data, key, state, pre, out)

    with mesh:
        step_s_j = jax.jit(step_s)
        # two threaded warmup calls: the first compile is for shard_state's
        # placement, the second for the step's own output shardings (the
        # fixed point the steady-state loop runs at) — timing from the first
        # output would hide a full recompile inside the loop
        st = jax.block_until_ready(step_s_j(data_s, key, st_s))
        st = jax.block_until_ready(step_s_j(data_s, key, st))
        t0 = time.time()
        for _ in range(iters):
            st = step_s_j(data_s, key, st)
        jax.block_until_ready(st)
        t_s = (time.time() - t0) / iters

    print(f"ibrm {model} n={n} m={m}: unsharded {t_u*1e3:.1f} ms/iter "
          f"({m/t_u/1e6:.2f}M upd/s), sharded-path(S=1) {t_s*1e3:.1f} ms/iter "
          f"({m/t_s/1e6:.2f}M upd/s), ratio {t_s/t_u:.3f}x", flush=True)
    return t_u, t_s


def bench_ibrm_mc(n=16384, m=500_000, block=128, model="BayesR", K=8, iters=10):
    """Multi-chain x SNP-sharded composition (VERDICT r3 item 3): K chains
    swept per turn through `_sweep_snp_sharded_mc` at S=1, vs the unsharded
    multi-chain kernel.  The per-turn X DMA is shared by all K chains, so
    the aggregate SNP-update rate scales far better than Kx one chain."""
    rng = np.random.default_rng(0)
    M = _sim_geno(rng, n, m)
    b = rng.normal(0, 0.05, m).astype(np.float32)
    y = rng.normal(0, 1, n).astype(np.float32)
    for j0 in range(0, m, 8192):
        y += M[:, j0:j0 + 8192].astype(np.float32) @ b[j0:j0 + 8192]
    if model == "BayesR":
        pi = np.array([0.95, 0.02, 0.02, 0.01])
        fold = np.array([0.0, 1e-4, 1e-3, 1e-2])
    else:
        pi, fold = np.array([0.95, 0.05]), None
    data = G.prepare_gibbs_data(y, M, block=block, dtype=jnp.float32,
                                geno_dtype="int8", fold=fold)
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model=model, n=int(data.y.shape[0]), n_real=n,
        m=m, m_pad=int(data.xpx.shape[0]), block=block,
        nc=0, nlevels=(), n_fold=len(pi), niter=100, nburn=50, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0,
        use_pallas=jax.default_backend() != "cpu",
    )
    st0 = G.init_state(spec, data, pr, pi)
    states0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), st0)
    keys = jax.random.split(jax.random.PRNGKey(1), K)

    step_u = jax.jit(partial(G.one_iteration_batch, spec))
    ss = jax.block_until_ready(step_u(data, keys, states0))
    ss = jax.block_until_ready(step_u(data, keys, ss))
    t0 = time.time()
    for _ in range(iters):
        ss = step_u(data, keys, ss)
    jax.block_until_ready(ss)
    t_u = (time.time() - t0) / iters

    from hibayes_tpu.parallel.mesh import make_mesh, shard_gibbs_data

    mesh = make_mesh(1, shape=(1, 1))
    data_s = shard_gibbs_data(data, mesh)

    def step_s(data, keys, states):
        kk = jax.vmap(lambda k, it: jax.random.fold_in(k, it))(keys, states.it)
        pre = jax.vmap(lambda k, s: G._pre_sweep(spec, data, k, s))(kk, states)
        out = G._sweep_snp_sharded_mc(
            spec, data, pre["consts"], pre["rnd"], pre["vei"], states.g,
            pre["vargL_in"], pre["yadj"], pre["u"], mesh,
        )
        return G._post_sweep_batch(spec, data, kk, states, pre, out)

    with mesh:
        step_s_j = jax.jit(step_s)
        ss = jax.block_until_ready(step_s_j(data_s, keys, states0))
        ss = jax.block_until_ready(step_s_j(data_s, keys, ss))
        t0 = time.time()
        for _ in range(iters):
            ss = step_s_j(data_s, keys, ss)
        jax.block_until_ready(ss)
        t_s = (time.time() - t0) / iters

    print(f"ibrm {model} n={n} m={m} K={K} chains: unsharded "
          f"{t_u*1e3:.1f} ms/iter ({K*m/t_u/1e6:.2f}M upd/s aggregate), "
          f"sharded-path(S=1) {t_s*1e3:.1f} ms/iter "
          f"({K*m/t_s/1e6:.2f}M upd/s), ratio {t_s/t_u:.3f}x", flush=True)
    return t_u, t_s


def bench_sbrm(m=500_000, T=128, K=9, iters=10):
    from hibayes_tpu.data.sparse_ld import TiledSparseLD

    nbr = -(-m // T)
    rho = 0.9
    idx = np.arange(T)
    motifs = [(rho ** np.abs(idx[:, None] - (idx[None, :] + d * T))).astype(np.float32)
              for d in range(K // 2 + 1)]
    half = K // 2
    col_idx = np.zeros((nbr, K), np.int32)
    valid = np.zeros((nbr, K), bool)
    tiles = np.zeros((nbr, K, T, T), np.float32)
    for i in range(nbr):
        js = [i] + [j for off in range(1, half + 1)
                    for j in (i - off, i + off) if 0 <= j < nbr]
        for k, j in enumerate(js):
            col_idx[i, k] = j
            valid[i, k] = True
            tiles[i, k] = motifs[abs(j - i)] if j >= i else motifs[abs(j - i)].T
    ld = TiledSparseLD(tile=T, m=m, col_idx=col_idx, valid=valid, tiles=tiles,
                       nnz_col=np.full(m, K * T, np.int64))
    rng = np.random.default_rng(0)
    ngw = 50_000
    b_true = (rng.random(m) < 0.01) * rng.normal(0, 0.05, m)
    Bm = ld.matvec(b_true)
    ss = np.column_stack([np.full(m, 0.3), Bm, np.full(m, 1 / np.sqrt(ngw)),
                          np.full(m, ngw)])
    data, n_eff, vary, nvar0, seg_sizes, seg_real = SG.prepare_sgibbs_data(
        ss, ld, fold=np.array([0., 1.]), block=T, dtype=jnp.float32)
    pr = G.resolve_priors(None, float(np.sum(np.asarray(ld.diag))), 0.95,
                          nr=0, vary=vary)
    spec = G.GibbsSpec(
        model="BayesCpi", n=n_eff, m=m, m_pad=int(sum(seg_sizes)), block=T,
        nc=0, nlevels=(), n_fold=2, niter=20, nburn=10, thin=5, nvar0=nvar0,
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, vargl_strict_pos=True,
        real_excl_nvar0=True, reject_guard=True, vary=vary,
        seg_sizes=seg_sizes, seg_real=seg_real,
        use_pallas=jax.default_backend() != "cpu",
    )
    st0 = SG.init_s_state(spec, data, pr, np.array([0.95, 0.05]))
    key = jax.random.PRNGKey(1)

    step_u = jax.jit(partial(SG.one_s_iteration, spec))
    st = jax.block_until_ready(step_u(data, key, st0))
    st = jax.block_until_ready(step_u(data, key, st))
    t0 = time.time()
    for _ in range(iters):
        st = step_u(data, key, st)
    jax.block_until_ready(st)
    t_u = (time.time() - t0) / iters

    mesh = make_mesh(1, shape=(1, 1))

    def step_s(data, key, state):
        return SG.one_s_iteration(spec, data, key, state, mesh=mesh)

    # force the sharded branch: S=1 fails the snp>1 check, so call the
    # sharded sweep directly through a thin step
    def step_s(data, key, state):
        dt = data.xy.dtype
        m_pad = spec.m_pad
        k2 = jax.random.fold_in(key, state.it)
        z = jax.random.normal(jax.random.fold_in(k2, G.STREAM_SNP_Z), (m_pad,), dtype=dt)
        u = jax.random.uniform(jax.random.fold_in(k2, G.STREAM_SNP_U), (m_pad,), dtype=dt)
        chi = jnp.ones((m_pad,), dt)
        z2 = jnp.zeros((m_pad,), dt)
        vei = data.varediff * state.vara + state.vare
        consts = {
            "varg": state.varg,
            "s2varg_df": jnp.asarray(spec.s2varg * spec.dfvara, dt),
            "logpi": jnp.log(state.pi),
            "lambda2": state.lambda2,
            "vara_fold": state.vara_fold,
            "fold": data.fold,
            "vary": jnp.asarray(spec.vary, dt),
            "reject_key": jax.random.fold_in(k2, 99),
        }
        vargL_full = jnp.zeros((m_pad,), dt)
        r_hat, g_new, track, vargL_new, vi, vR = SG._tiled_sweep_snp_sharded(
            spec, consts, data, vei, state.g, vargL_full, z, u, chi, z2,
            state.r_hat, mesh, key=k2,
        )
        return SG._s_finish(spec, data, k2, state, g_new, track, state.vargL,
                            r_hat, vi, vR)

    # shard_sgibbs_data is a no-op at snp<=1, so place the tile arrays with
    # explicit replicated NamedShardings (mirrors the ibrm path) — otherwise
    # the timing relies on jit not re-laying-out the 2.3 GB of tiles
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from hibayes_tpu.parallel.mesh import shard_sgibbs_data

    data_sh = shard_sgibbs_data(data, mesh)
    if int(mesh.shape.get("snp", 1)) <= 1:
        rep = lambda x: (jax.device_put(x, NamedSharding(mesh, PS()))
                         if hasattr(x, "shape") else x)
        data_sh = jax.tree_util.tree_map(rep, data_sh)
    with mesh:
        step_s_j = jax.jit(step_s)
        st = jax.block_until_ready(step_s_j(data_sh, key, st0))
        st = jax.block_until_ready(step_s_j(data_sh, key, st))
        t0 = time.time()
        for _ in range(iters):
            st = step_s_j(data_sh, key, st)
        jax.block_until_ready(st)
        t_s = (time.time() - t0) / iters

    print(f"sbrm tiled m={m}: unsharded {t_u*1e3:.1f} ms/iter "
          f"({m/t_u/1e6:.2f}M upd/s), sharded-path(S=1) {t_s*1e3:.1f} ms/iter "
          f"({m/t_s/1e6:.2f}M upd/s), ratio {t_s/t_u:.3f}x", flush=True)
    return t_u, t_s


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ibrm", "both"):
        bench_ibrm()
    if which in ("sbrm", "both"):
        bench_sbrm()
