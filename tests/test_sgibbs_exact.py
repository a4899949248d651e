"""Summary-level blocked sweep vs a sequential NumPy oracle (SBayesD/SBayesS).

Mirrors the reference's r_hat chain (src/SBayesD.cpp:251-469, SBayesS
varediff semantics) with the same random streams, proving the blocked LD
segment formulation preserves the sequential Markov kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hibayes_tpu.data.ld import BlockDiagLD, DenseLD
from hibayes_tpu.engine import gibbs as G
from hibayes_tpu.engine import sgibbs as SG

BLOCK = 32


def make_problem(model, blockdiag=False, seed=13, n=400, m=96):
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, rng.uniform(0.1, 0.5, m), size=(n, m)).astype(np.float64)
    beta_true = rng.normal(0, 0.1, m)
    y = X @ beta_true + rng.normal(0, 1, n)
    # single-SNP GWAS summary stats
    beta = np.zeros(m)
    se = np.zeros(m)
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    for j in range(m):
        d = (Xc[:, j] ** 2).sum()
        beta[j] = (Xc[:, j] * yc).sum() / d
        resid = yc - beta[j] * Xc[:, j]
        se[j] = np.sqrt((resid ** 2).sum() / (n - 2) / d)
    ss = np.stack([np.minimum(X.mean(0) / 2, 1 - X.mean(0) / 2),
                   beta, se, np.full(m, n)], axis=1)
    cov = (Xc.T @ Xc) / n
    if blockdiag:
        h = m // 2
        ld = BlockDiagLD(blocks=[cov[:h, :h], cov[h:, h:]], sizes=[h, h])
    else:
        ld = DenseLD(values=cov)

    n_fold = 4 if model == "BayesR" else 2
    pi = np.array([0.95, 0.02, 0.02, 0.01]) if model == "BayesR" else np.array([0.95, 0.05])
    if model in ("BayesRR", "BayesA", "BayesL"):
        pi = np.array([0.0, 1.0])
    fold = np.array([0.0, 1e-4, 1e-3, 1e-2]) if model == "BayesR" else None

    data, n_eff, vary, nvar0, seg_sizes, seg_real = SG.prepare_sgibbs_data(
        ss, ld, fold=fold, block=BLOCK, dtype=jnp.float64,
    )
    pr = G.resolve_priors(None, float(np.asarray(ld.diag).sum()), pi[0], nr=0, vary=vary)
    spec = G.GibbsSpec(
        model=model, n=n_eff, m=m, m_pad=int(sum(seg_sizes)), block=BLOCK,
        nc=0, nlevels=(), n_fold=n_fold, niter=40, nburn=20, thin=5,
        nvar0=nvar0, fixpi=model in ("BayesB", "BayesC"),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, vargl_strict_pos=True,
        reject_guard=False,  # oracle replays the guard-free path
        vary=vary, seg_sizes=seg_sizes, seg_real=seg_real,
    )
    return data, spec, pr, pi


def oracle_s_iteration(spec, dnp, base_key, st):
    """Sequential reference iteration over r_hat (SBayesD.cpp:251-469)."""
    from tests.oracle import _chisq, _gamma_vec, _norm, _unif, _inv_gaussian_from

    st = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in st.items()}
    m_pad = spec.m_pad
    n = spec.n
    key = jax.random.fold_in(base_key, st["it"])
    z_snp = _norm(jax.random.fold_in(key, G.STREAM_SNP_Z), (m_pad,))
    ushape = (m_pad, spec.n_fold) if spec.model_index == 6 else (m_pad,)
    u_snp = _unif(jax.random.fold_in(key, G.STREAM_SNP_U), ushape)
    chi_snp = _chisq(jax.random.fold_in(key, G.STREAM_SNP_CHI), spec.dfvara + 1.0, (m_pad,))
    z2_snp = _norm(jax.random.fold_in(key, G.STREAM_SNP_Z2), (m_pad,))

    xpx, vx = dnp["xpx"], dnp["vx"]
    LD_full = dnp["LD_full"]  # segment-padded (m_pad, m_pad) block-diagonal
    r_hat, g = st["r_hat"], st["g"]
    logpi = np.log(np.maximum(st["pi"], 1e-300))
    s2varg_df = spec.s2varg * spec.dfvara
    varg = st["varg"]
    vara, vare = st["vara"], st["vare"]
    vargi_acc = 0.0
    vargR_acc = 0.0
    track = np.zeros(m_pad, dtype=np.int64)
    varediff = dnp["varediff"]
    mi = spec.model_index
    fold = dnp["fold"]
    vara_fold = st["vara_fold"]

    for j in range(m_pad):
        if vx[j] <= 0:
            continue
        xx = xpx[j]
        old = g[j]
        vei = varediff[j] * vara + vare
        rhs = r_hat[j] + xx * old
        gi = 0.0
        if mi == 1:
            v = xx + vei / varg
            gi = rhs / v + np.sqrt(vei / v) * z_snp[j]
        elif mi == 4:
            lhs = xx / vei
            logdetV = np.log(varg * lhs + 1.0)
            v = xx + vei / varg
            uhat = rhs / v
            s1 = -0.5 * (logdetV - rhs * uhat / vei) + logpi[1]
            accept0 = 1.0 / (1.0 + np.exp(s1 - logpi[0]))
            ind = 0 if u_snp[j] < accept0 else 1
            track[j] = ind
            if ind:
                gi = rhs / v + np.sqrt(vei / v) * z_snp[j]
                vargi_acc += gi * gi
        elif mi == 5:
            v = xx + 1.0 / st["vargL"][j]
            gi = rhs / v + np.sqrt(vei / v) * z_snp[j]
            if abs(gi) < 1e-6:
                gi = 1e-6
            lam2 = st["lambda2"]
            vgi = 1.0 / _inv_gaussian_from(
                z2_snp[j], u_snp[j], np.sqrt(vei) * np.sqrt(lam2) / abs(gi), lam2
            )
            if vgi > 0:
                st["vargL"][j] = vgi
        else:  # BayesR — Gumbel-max categorical fold draw (engine-identical)
            lhs = xx / vei
            s = logpi.copy()
            for f in range(1, spec.n_fold):
                vf = max(vara_fold[f], 1e-30)
                s[f] = -0.5 * (np.log(vf * lhs + 1.0)
                               - rhs * (rhs / (xx + vei / vf)) / vei) + logpi[f]
            gum = -np.log(-np.log(np.maximum(u_snp[j], 1e-12)))
            ind = int(np.argmax(s + gum))
            track[j] = ind
            if ind:
                v = xx + vei / max(vara_fold[ind], 1e-30)
                gi = rhs / v + np.sqrt(vei / v) * z_snp[j]
                vargR_acc += gi * gi / fold[ind]
        dg = old - gi
        if dg != 0.0:
            r_hat += dg * n * LD_full[:, j]
            g[j] = gi
        else:
            g[j] = gi

    # global updates (shared with individual engine; replay via jax draws)
    real = dnp["real"]
    m_real, nvar0 = spec.m, spec.nvar0
    kvarg = jax.random.fold_in(key, G.STREAM_VARG)
    kpi = jax.random.fold_in(key, G.STREAM_PI)
    if mi == 1:
        chi = _chisq(kvarg, spec.dfvara + m_real - nvar0)
        st["varg"] = (g @ g + s2varg_df) / chi
    elif mi == 4:
        nnz = float(((track == 1) & real).sum())
        chi = _chisq(kvarg, spec.dfvara + nnz)
        st["varg"] = (vargi_acc + s2varg_df) / chi
        if not spec.fixpi:
            gam = _gamma_vec(kpi, np.array([m_real - nvar0 - nnz, nnz]) + 1.0)
            st["pi"] = gam / gam.sum()
    elif mi == 5:
        shape = spec.lambda_shape0 + m_real - nvar0
        rate = spec.lambda_rate0 + st["vargL"][real].sum() / 2.0
        gd = np.asarray(jax.random.gamma(
            jax.random.fold_in(key, G.STREAM_LAMBDA), jnp.float64(shape), dtype=jnp.float64))
        st["lambda2"] = gd / rate
    elif mi == 6:
        fold_num = np.array([float(((track == f) & real).sum()) for f in range(spec.n_fold)])
        nnz = m_real - fold_num[0]
        chi = _chisq(kvarg, spec.dfvara + nnz)
        st["varg"] = (vargR_acc + s2varg_df) / chi
        st["vara_fold"] = st["varg"] * fold
        fold_num[0] -= nvar0
        if not spec.fixpi:
            gam = _gamma_vec(kpi, fold_num + 1.0)
            st["pi"] = gam / gam.sum()

    xy, yy = dnp["xy"], dnp["yy"]
    chi_a = _chisq(jax.random.fold_in(key, 31), n + spec.dfvara)
    st["vara"] = (g @ (xy - r_hat) + spec.s2vara * spec.dfvara) / chi_a
    chi_e = _chisq(jax.random.fold_in(key, G.STREAM_VE), n + spec.dfvare)
    ve_new = (yy - g @ (xy + r_hat) + spec.s2vare * spec.dfvare) / chi_e
    st["vare"] = 0.5 * st["vara"] if ve_new < 0 else ve_new
    st["r_hat"], st["g"], st["track"] = r_hat, g, track
    st["it"] += 1
    return st


@pytest.mark.parametrize("model,blockdiag", [
    ("BayesRR", False), ("BayesCpi", False), ("BayesL", False),
    ("BayesR", False), ("BayesCpi", True),
])
def test_sgibbs_matches_sequential_oracle(model, blockdiag):
    data, spec, pr, pi = make_problem(model, blockdiag=blockdiag)
    base_key = jax.random.PRNGKey(21)
    state = SG.init_s_state(spec, data, pr, pi)
    step = jax.jit(lambda s: SG.one_s_iteration(spec, data, base_key, s))

    # assemble the segment-padded block-diagonal LD for the oracle
    m_pad = spec.m_pad
    LD_full = np.zeros((m_pad, m_pad))
    off = 0
    for seg in data.ld_segs:
        mc = seg.shape[0]
        LD_full[off: off + mc, off: off + mc] = np.asarray(seg)
        off += mc
    dnp = {
        "xpx": np.asarray(data.xpx, dtype=np.float64),
        "vx": np.asarray(data.vx, dtype=np.float64),
        "LD_full": LD_full,
        "varediff": np.asarray(data.varediff, dtype=np.float64),
        "xy": np.asarray(data.xy, dtype=np.float64),
        "yy": float(data.yy),
        "real": np.asarray(data.real),
        "fold": np.asarray(data.fold, dtype=np.float64),
    }
    ost = {
        "it": 0,
        "r_hat": np.asarray(data.xy, dtype=np.float64).copy(),
        "g": np.zeros(m_pad),
        "varg": pr.varg,
        "vargL": np.full(m_pad, pr.varg),
        "lambda2": pr.lambda2,
        "pi": pi.astype(np.float64),
        "vara_fold": pr.varg * np.asarray(data.fold, dtype=np.float64),
        "vara": pr.vara,
        "vare": pr.vare,
    }
    for it in range(3):
        state = step(state)
        ost = oracle_s_iteration(spec, dnp, base_key, ost)
        np.testing.assert_allclose(np.asarray(state.g), ost["g"], rtol=1e-8,
                                   atol=1e-10, err_msg=f"iter {it}")
        np.testing.assert_allclose(np.asarray(state.r_hat), ost["r_hat"],
                                   rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(float(state.vara), ost["vara"], rtol=1e-8)
        np.testing.assert_allclose(float(state.vare), ost["vare"], rtol=1e-8)
        if model in ("BayesCpi", "BayesR"):
            np.testing.assert_array_equal(np.asarray(state.track), ost["track"])
