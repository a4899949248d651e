"""Tiled-sparse LD storage + O(nnz) summary sweep.

Reference parity targets: chisq-pruned sparse LD construction
(src/tXXmat.cpp:147-152) and the sparse-LD SBayesS sampler semantics
(src/SBayesS.cpp:292-296) — rebuilt as a block-sparse tile layout whose
memory and per-sweep work are O(nnz), with the dense-segment engine as the
small-m reference implementation it must agree with.
"""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy shard_map/interpret compiles: full lane only


import hibayes_tpu as ht
from hibayes_tpu.data.ld import ldmat
from hibayes_tpu.data.sparse_ld import TiledSparseLD, build_tiled_ld


def _banded_geno(n=500, m=200, seed=3, copy_p=0.55):
    """Genotype with realistic local LD (adjacent-SNP correlation ~ copy_p,
    decaying geometrically with distance -> banded pruned pattern).  Note:
    near-duplicate columns (copy_p >~ 0.8) make the summary model itself
    ill-posed — the reference's SBayes samplers diverge identically there
    (src/SBayesD.cpp:460-468 has no positivity guard on Vg)."""
    rng = np.random.default_rng(seed)
    base = rng.binomial(2, 0.4, size=(n, m)).astype(np.int8)
    for j in range(1, m):
        copy = rng.random(n) < copy_p
        base[copy, j] = base[copy, j - 1]
    return base


def _sumstat(X, h2=0.4, seed=11):
    """Consistent marginal GWAS summary stats simulated from the panel
    itself (random betas inconsistent with the LD diverge ANY SBayes chain)."""
    rng = np.random.default_rng(seed)
    n, m = X.shape
    Xf = X.astype(np.float64)
    b_true = rng.normal(0, 1, m) * (rng.random(m) < 0.1)
    gval = (Xf - Xf.mean(0)) @ b_true
    gval *= np.sqrt(h2 / max(gval.var(), 1e-12))
    y = gval + rng.normal(0, np.sqrt(1 - h2), n)
    vx = Xf.var(axis=0)
    beta = ((Xf - Xf.mean(0)) * (y - y.mean())[:, None]).mean(axis=0) / np.maximum(vx, 1e-12)
    resid_var = np.maximum(y.var() - beta**2 * vx, 1e-6)
    se = np.sqrt(resid_var / (np.maximum(vx, 1e-12) * (n - 2)))
    maf = np.minimum(Xf.mean(0) / 2, 1 - Xf.mean(0) / 2)
    return np.column_stack([maf, beta, se, np.full(m, n)])


CHISQ = 30.0  # r^2 > 30/n: keeps the real local LD, prunes sampling noise


def test_builder_matches_dense_chisq_path():
    X = _banded_geno()
    n = X.shape[0]
    dense = ldmat(X, chisq=CHISQ)                       # SparseLD (dense store)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=64, dtype=np.float64)
    np.testing.assert_allclose(tiled.to_dense(), dense.values, atol=1e-10)
    np.testing.assert_array_equal(tiled.nnz_per_col(), dense.nnz_per_col())
    # O(nnz): the banded pattern must store far fewer tiles than dense
    nbr = tiled.nbr
    assert tiled.n_tiles < 0.5 * nbr * nbr


def test_builder_stripe_invariance():
    X = _banded_geno(n=300, m=96)
    a = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=32, dtype=np.float64)
    b = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=96, dtype=np.float64)
    np.testing.assert_allclose(a.to_dense(), b.to_dense(), atol=1e-12)
    np.testing.assert_array_equal(a.nnz_col, b.nnz_col)


def test_builder_per_chromosome_blocks():
    X = _banded_geno(n=300, m=90)
    chrom = np.repeat(["1", "2", "3"], 30)
    tiled = build_tiled_ld(X, chisq=None, chrom=chrom, tile=16, stripe=48,
                           dtype=np.float64)
    dense_blocks = ldmat(X, map={"SNP": np.array([f"M{i}" for i in range(90)]),
                                 "Chr": chrom, "Pos": np.arange(90)}, ldchr=False)
    G = tiled.to_dense()
    off = 0
    for b, s in zip(dense_blocks.blocks, dense_blocks.sizes):
        np.testing.assert_allclose(G[off : off + s, off : off + s], b, atol=1e-10)
        # off-block entries exactly zero
        G[off : off + s, off : off + s] = 0.0
        off += s
    assert np.abs(G).max() == 0.0


def test_matvec_and_from_dense_roundtrip():
    X = _banded_geno(n=200, m=80)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=32, dtype=np.float64)
    D = tiled.to_dense()
    v = np.random.default_rng(0).normal(size=80)
    np.testing.assert_allclose(tiled.matvec(v), D @ v, atol=1e-10)
    rt = TiledSparseLD.from_dense(D, tile=16)
    np.testing.assert_allclose(rt.to_dense(), D, atol=1e-14)
    np.testing.assert_array_equal(rt.nnz_col, tiled.nnz_col)


def test_from_scipy():
    sp = pytest.importorskip("scipy.sparse")
    X = _banded_geno(n=200, m=64)
    dense = ldmat(X, chisq=CHISQ)
    csr = sp.csr_matrix(dense.values)
    tiled = TiledSparseLD.from_scipy(csr, tile=16)
    np.testing.assert_allclose(tiled.to_dense(), dense.values, atol=1e-12)
    np.testing.assert_array_equal(tiled.nnz_col, dense.nnz_per_col())


@pytest.mark.parametrize("method", ["BayesCpi", "BayesR"])
def test_sbrm_tiled_matches_dense_sparse_chain(method):
    """The tiled sweep must realise the SAME Markov kernel as the dense-store
    SparseLD path: identical RNG streams, identical block order, the only
    difference being that pruned (zero) entries are skipped.  f64 chains must
    agree to rounding over a full fit."""
    import jax.numpy as jnp

    X = _banded_geno(n=400, m=128)
    ss = _sumstat(X)
    dense = ldmat(X, chisq=CHISQ)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=64, dtype=np.float64)

    kw = dict(niter=600, nburn=300, seed=7, verbose=False, dtype=jnp.float64)
    fit_d = ht.sbrm(ss, dense, method=method, block=16, **kw)
    fit_t = ht.sbrm(ss, tiled, method=method, **kw)

    assert np.isfinite(fit_d.alpha).all() and np.isfinite(fit_d.Vg)
    np.testing.assert_allclose(fit_t.Vg, fit_d.Vg, rtol=1e-6)
    np.testing.assert_allclose(fit_t.Ve, fit_d.Ve, rtol=1e-6)
    np.testing.assert_allclose(fit_t.alpha, fit_d.alpha, atol=1e-8)
    np.testing.assert_allclose(fit_t.pip, fit_d.pip, atol=1e-6)


def test_sbrm_tiled_f32_sane():
    """f32 (production dtype) tiled chain: finite, h2 in range."""
    X = _banded_geno(n=400, m=192)
    ss = _sumstat(X)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=32, stripe=64)
    fit = ht.sbrm(ss, tiled, method="BayesCpi", niter=400, nburn=200,
                  seed=3, verbose=False)
    assert np.isfinite(fit.alpha).all()
    assert 0.0 <= fit.h2 <= 1.0


def test_cg_tiled_matches_dense():
    X = _banded_geno(n=400, m=96)
    ss = _sumstat(X)
    dense = ldmat(X, chisq=CHISQ)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=48, dtype=np.float64)
    fit_d = ht.sbrm(ss, dense, method="CG", verbose=False)
    fit_t = ht.sbrm(ss, tiled, method="CG", verbose=False)
    np.testing.assert_allclose(fit_t.alpha, fit_d.alpha, atol=1e-5)
    np.testing.assert_allclose(fit_t.Vg, fit_d.Vg, rtol=1e-5)


def test_ldmat_tiled_entry_point():
    X = _banded_geno(n=200, m=64)
    out = ldmat(X, chisq=CHISQ, tiled=True, tile=16, stripe=32)
    assert isinstance(out, TiledSparseLD)
    dense = ldmat(X, chisq=CHISQ)
    np.testing.assert_allclose(out.to_dense(), dense.values, atol=1e-5)


def test_tiled_gwas_overlay_matches_dense():
    """Overlay entries (both SNPs in the gwas panel) must carry the panel's
    own covariance under the panel-n chisq rule; non-overlay entries keep
    the reference panel's values (tXXmat_Geno_gwas, tXXmat.cpp:314-502)."""
    rng = np.random.default_rng(9)
    X = _banded_geno(n=300, m=64, seed=6)
    Xg = _banded_geno(n=120, m=64, seed=7)[:, ::2]  # every other SNP shared
    map_ = {"SNP": np.array([f"s{i}" for i in range(64)]),
            "Chr": np.ones(64).astype(str), "Pos": np.arange(1, 65)}
    gmap = {"SNP": np.array([f"s{i}" for i in range(0, 64, 2)]),
            "Chr": np.ones(32).astype(str), "Pos": np.arange(1, 33)}

    # dense reference for the same rule: overlay then per-entry chisq with
    # the appropriate panel's n
    tiled = ldmat(X, map=map_, gwas_geno=Xg, gwas_map=gmap, ldchr=True,
                  chisq=CHISQ, tiled=True, tile=16, stripe=32)
    D = tiled.to_dense()

    def cov(A):
        Ac = A.astype(np.float64) - A.mean(axis=0)
        return Ac.T @ Ac / A.shape[0]

    G_ref = cov(X)
    G_ov = cov(Xg)
    pos = np.arange(0, 64, 2)
    expect = G_ref.copy()
    expect[np.ix_(pos, pos)] = G_ov
    sd_r = np.sqrt(np.diag(G_ref))
    keep = ((G_ref / np.outer(sd_r, sd_r)) ** 2 * 300) > CHISQ
    sd_g = np.sqrt(np.diag(G_ov))
    keep_ov = ((G_ov / np.outer(sd_g, sd_g)) ** 2 * 120) > CHISQ
    keep[np.ix_(pos, pos)] = keep_ov
    np.fill_diagonal(keep, True)
    expect = np.where(keep, expect, 0.0)
    np.testing.assert_allclose(D, expect, atol=1e-5)


def test_tiled_overlay_requires_positions():
    X = _banded_geno(n=100, m=32)
    with pytest.raises(ValueError):
        build_tiled_ld(X, chisq=5.0, tile=16, gwas_geno=X[:50])


def test_sbrm_tiled_snp_sharded_matches_single_device():
    """SNP-sharded tiled summary sweep (LD tile rows per-device, turn-based
    exact schedule, psum-merged r_hat deltas) must match the single-device
    tiled chain to the ind-shard equality standard."""
    import jax.numpy as jnp

    from hibayes_tpu.parallel.mesh import make_mesh

    X = _banded_geno(n=400, m=128)
    ss = _sumstat(X)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=64, dtype=np.float64)
    kw = dict(niter=400, nburn=200, seed=7, verbose=False, dtype=jnp.float64)
    fit1 = ht.sbrm(ss, tiled, method="BayesCpi", **kw)
    mesh = make_mesh(8, shape=(1, 8))
    fit8 = ht.sbrm(ss, tiled, method="BayesCpi", mesh=mesh, **kw)
    assert np.isfinite(fit1.alpha).all()
    np.testing.assert_allclose(fit8.Vg, fit1.Vg, rtol=1e-8)
    np.testing.assert_allclose(fit8.Ve, fit1.Ve, rtol=1e-8)
    np.testing.assert_allclose(fit8.alpha, fit1.alpha, atol=1e-10)
    np.testing.assert_allclose(fit8.pip, fit1.pip, rtol=1e-8)


def test_sbrm_tiled_snp_sharded_no_full_gather():
    """Compiled sharded step must keep per-device temp far below the global
    tile store (no all-gather of the LD)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from hibayes_tpu.engine import gibbs as G
    from hibayes_tpu.engine import sgibbs as SG
    from hibayes_tpu.parallel.mesh import make_mesh, shard_sgibbs_data

    X = _banded_geno(n=300, m=1024)
    ss = _sumstat(X)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=256)
    data, n_eff, vary, nvar0, seg_sizes, seg_real = SG.prepare_sgibbs_data(
        ss, tiled, fold=np.array([0.0, 1.0]), block=16, dtype=jnp.float32)
    pr = G.resolve_priors(None, float(np.sum(np.asarray(tiled.diag))), 0.95,
                          nr=0, vary=vary)
    spec = G.GibbsSpec(
        model="BayesCpi", n=n_eff, m=1024, m_pad=int(sum(seg_sizes)), block=16,
        nc=0, nlevels=(), n_fold=2, niter=20, nburn=10, thin=5, nvar0=nvar0,
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, vargl_strict_pos=True,
        real_excl_nvar0=True, reject_guard=True, vary=vary,
        seg_sizes=seg_sizes, seg_real=seg_real,
    )
    mesh = make_mesh(8, shape=(1, 8))
    d8 = shard_sgibbs_data(data, mesh)
    st0 = SG.init_s_state(spec, d8, pr, np.array([0.95, 0.05]))
    with mesh:
        compiled = (
            jax.jit(partial(SG.one_s_iteration, spec, mesh=mesh))
            .lower(d8, jax.random.PRNGKey(0), st0)
            .compile()
        )
    tile_bytes = tiled.tiles.nbytes
    temp = compiled.memory_analysis().temp_size_in_bytes
    assert temp < tile_bytes / 2, f"temp {temp} vs tiles {tile_bytes}"


def test_sbrm_tiled_multichain():
    """nchains>1 with tiled LD rides the vmapped XLA sweep; R-hat present and
    chains agree with the statistical truth scale."""
    import jax.numpy as jnp

    X = _banded_geno(n=400, m=96)
    ss = _sumstat(X)
    tiled = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=48, dtype=np.float64)
    fit = ht.sbrm(ss, tiled, method="BayesCpi", niter=300, nburn=150,
                  seed=5, verbose=False, dtype=jnp.float64, nchains=3)
    assert fit.rhat is not None and "Vg" in fit.rhat
    assert np.isfinite(fit.alpha).all()
    assert 0.0 <= fit.h2 <= 1.0


def test_device_builder_matches_host_path():
    """int8+f32 inputs take the on-device tile-select path; values must match
    the host f64 path to f32 rounding and the pattern exactly."""
    X = _banded_geno(n=300, m=160)
    dev = build_tiled_ld(X, chisq=CHISQ, tile=16, stripe=64, dtype=np.float32)
    host = build_tiled_ld(X.astype(np.float64), chisq=CHISQ, tile=16,
                          stripe=64, dtype=np.float64)
    np.testing.assert_array_equal(dev.nnz_col, host.nnz_col)
    np.testing.assert_allclose(dev.to_dense(), host.to_dense(),
                               rtol=2e-5, atol=2e-6)
    # per-chromosome variant
    chrom = np.repeat(["1", "2"], 80)
    dev_c = build_tiled_ld(X, chisq=None, chrom=chrom, tile=16, stripe=64,
                           dtype=np.float32)
    host_c = build_tiled_ld(X.astype(np.float64), chisq=None, chrom=chrom,
                            tile=16, stripe=64, dtype=np.float64)
    np.testing.assert_array_equal(dev_c.nnz_col, host_c.nnz_col)
    np.testing.assert_allclose(dev_c.to_dense(), host_c.to_dense(),
                               rtol=2e-5, atol=2e-6)
