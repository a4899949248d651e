"""Benchmark: SNP-updates/sec of the blocked-Gibbs engine on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against an in-process emulation of the reference's
sequential per-SNP loop (one ddot + one daxpy of length n per SNP over BLAS,
the exact hot-loop structure of src/Bayes.cpp:586-605) measured on this
host's CPU — the reference publishes no numbers of its own (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def _sim_geno(rng, n, m, maf=0.3):
    """Fast synthetic int8 genotype: byte LUT instead of np.random.binomial
    (binomial is ~100ns/draw — minutes for large n*m; this is ~1GB/s)."""
    p0 = (1 - maf) ** 2
    p1 = 2 * maf * (1 - maf)
    raw = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    out = np.ones((n, m), dtype=np.int8)
    out[raw < int(p0 * 256)] = 0
    out[raw >= int((p0 + p1) * 256)] = 2
    return out


def _sim_pheno(rng, M, chunk=8192):
    """y = M @ b + e without materializing a float copy of the genotype."""
    n, m = M.shape
    b = rng.normal(0, 0.05, m).astype(np.float32)
    y = rng.normal(0, 1, n).astype(np.float32)
    for j0 in range(0, m, chunk):
        y += M[:, j0 : j0 + chunk].astype(np.float32) @ b[j0 : j0 + chunk]
    return y


def _pi_fold(model):
    if model == "BayesR":
        return np.array([0.95, 0.02, 0.02, 0.01]), np.array([0.0, 1e-4, 1e-3, 1e-2])
    return np.array([0.95, 0.05]), None


def measure_engine(n, m, block, niter, model="BayesCpi", dtype=None):
    import jax
    import jax.numpy as jnp

    from hibayes_tpu.engine import gibbs as G

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(0)
    M = _sim_geno(rng, n, m)
    y = _sim_pheno(rng, M)
    pi, fold = _pi_fold(model)
    data = G.prepare_gibbs_data(y, M, block=block, dtype=dtype, geno_dtype="int8",
                                fold=fold)
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)

    spec = G.GibbsSpec(
        # prepare_gibbs_data may auto-pad the row axis (e.g. BENCH_N=50000):
        # arrays use the padded count, statistics the real one
        model=model, n=int(data.y.shape[0]), n_real=n,
        m=m, m_pad=int(data.xpx.shape[0]), block=block,
        nc=0, nlevels=(), n_fold=len(pi), niter=niter, nburn=niter // 2, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare,
        s2vare=pr.s2vare, s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0,
        use_pallas=jax.default_backend() != "cpu",
    )

    # warmup/compile with the IDENTICAL spec (niter is part of the jit key)
    G.run_chain(spec, data, pr, pi, seed=1)

    t0 = time.time()
    state, samples, extras = G.run_chain(spec, data, pr, pi, seed=2)
    elapsed = time.time() - t0
    iters = spec.niter_eff
    return iters * m / elapsed, elapsed, iters, spec, data


def hbm_stats(spec, data, t_iter, n_chains=1):
    """Achieved HBM bandwidth of the sweep vs the chip's speed-of-light
    (VERDICT r5 item 8).  Bytes-touched model per iteration: the genotype
    block layout crosses HBM once per iteration for the VMEM-resident
    kernels (sweep_mc_t/_ti) and twice for the chunked-DMA variants (r0
    pass + delta pass); W/P/residual traffic rides along (counted once).
    v5e HBM speed-of-light: 819 GB/s."""
    import jax
    import jax.numpy as jnp

    n_arr = int(data.X_blocks.shape[1])
    geno_bytes = data.X_blocks.size * data.X_blocks.dtype.itemsize
    interp = jax.default_backend() == "cpu"
    sel = G_sel = None
    try:
        from hibayes_tpu.engine.gibbs import _select_sweep_mc

        sel = _select_sweep_mc(spec, n_arr, max(n_chains, 1), jnp.float32,
                               data.X_blocks.dtype.itemsize, interp)
        G_sel = getattr(getattr(sel, "func", sel), "__name__", "")
    except Exception:
        G_sel = ""
    passes = 1 if G_sel in ("sweep_mc_t", "sweep_mc_ti") else 2
    aux = (data.W_blocks.size * 4                       # Gram blocks
           + 4 * spec.m_pad * 4 * max(n_chains, 1) * 2  # P rows in+out
           + 4 * n_arr * 4 * max(n_chains, 1))          # yadj/u in/out
    bytes_per_iter = geno_bytes * passes + aux
    gbps = bytes_per_iter / t_iter / 1e9
    return {"kernel": G_sel or "xla", "hbm_gbps": round(gbps, 1),
            "hbm_frac": round(gbps / 819.0, 3)}


def measure_engine_mc(n, m, block, niter, nchains, model="BayesCpi"):
    """Aggregate SNP-updates/s of the fused multi-chain kernel (K chains share
    each genotype block; chains ride the VPU lanes, SNPs the sublanes)."""
    import jax
    import jax.numpy as jnp

    from hibayes_tpu.engine import gibbs as G

    rng = np.random.default_rng(0)
    M = _sim_geno(rng, n, m)
    y = _sim_pheno(rng, M)
    pi, fold = _pi_fold(model)
    data = G.prepare_gibbs_data(y, M, block=block, dtype=jnp.float32,
                                geno_dtype="int8", fold=fold)
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model=model, n=int(data.y.shape[0]), n_real=n,
        m=m, m_pad=int(data.xpx.shape[0]), block=block,
        nc=0, nlevels=(), n_fold=len(pi), niter=niter, nburn=niter // 2, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare,
        s2vare=pr.s2vare, s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0,
        use_pallas=jax.default_backend() != "cpu",
    )
    G.run_chains(spec, data, pr, pi, nchains=nchains, seed=1)  # compile
    t0 = time.time()
    G.run_chains(spec, data, pr, pi, nchains=nchains, seed=2)
    elapsed = time.time() - t0
    return spec.niter_eff * m * nchains / elapsed, elapsed


def measure_reference_emulation(n, m, iters=10):
    """The reference hot loop: sequential per-SNP ddot + daxpy over a dense
    double genotype (src/Bayes.cpp:586-605), COMPILED C -O3 -march=native
    (native/src/ref_hotloop.c) — an honest stand-in for the Rcpp/BLAS-1 loop.
    Falls back to a NumPy loop (~100x slower) when no toolchain exists."""
    rng = np.random.default_rng(0)
    X = np.asfortranarray(rng.binomial(2, 0.3, size=(n, m)).astype(np.float64))
    yadj = rng.normal(size=n)
    g = np.zeros(m)
    xpx = (X * X).sum(axis=0)
    z = rng.normal(size=(iters, m)).reshape(-1)

    try:
        from hibayes_tpu.native import hotloop

        if hotloop.available():
            hotloop.run(X, yadj.copy(), g.copy(), xpx, z, 1)  # warm cache
            t0 = time.time()
            hotloop.run(X, yadj, g, xpx, z, iters)
            return iters * m / (time.time() - t0)
    except ImportError:
        pass

    ve, varg = 1.0, 0.01
    t0 = time.time()
    for it in range(iters):
        for j in range(m):
            xj = X[:, j]
            rhs = xj @ yadj + xpx[j] * g[j]
            v = xpx[j] + ve / varg
            gi = rhs / v + np.sqrt(ve / v) * z[it * m + j]
            yadj += (g[j] - gi) * xj
            g[j] = gi
    elapsed = time.time() - t0
    return iters * m / elapsed


def main():
    n = int(os.environ.get("BENCH_N", 4096))
    m = int(os.environ.get("BENCH_M", 65536))
    block = int(os.environ.get("BENCH_BLOCK", 128))
    niter = int(os.environ.get("BENCH_ITERS", 200))
    nchains = int(os.environ.get("BENCH_CHAINS", 64))
    model = os.environ.get("BENCH_MODEL", "BayesCpi")

    extra = {}
    if nchains > 1:
        ours, elapsed = measure_engine_mc(n, m, block, niter, nchains, model=model)
        label = f"SNP-updates/s ({model}, n={n}, m={m}, block={block}, chains={nchains})"
        # single-chain vs single-chain alongside the aggregate ratio, so the
        # artifact is self-honest about what the 10^3x-scale number compares
        ours_1, _, _, spec1, data1 = measure_engine(n, m, block, niter, model=model)
        extra["single_chain_value"] = round(ours_1, 1)
        extra.update(hbm_stats(spec1, data1, m / max(ours_1, 1e-9)))
    else:
        ours, elapsed, iters, spec1, data1 = measure_engine(n, m, block, niter, model=model)
        label = f"SNP-updates/s ({model}, n={n}, m={m}, block={block})"
        extra.update(hbm_stats(spec1, data1, m / max(ours, 1e-9)))
    base = measure_reference_emulation(min(n, 4096), min(m, 4096))
    if "single_chain_value" in extra:
        extra["single_chain_vs_baseline"] = round(extra["single_chain_value"] / base, 3)
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(ours, 1),
                "unit": "SNP-updates/s",
                "vs_baseline": round(ours / base, 3),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
