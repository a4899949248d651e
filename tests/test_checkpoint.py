
import pytest
pytestmark = pytest.mark.slow  # heavy shard_map/interpret compiles: full lane only

"""Checkpoint/resume: a resumed chain is bit-identical to an uninterrupted one."""

import jax
import numpy as np

from hibayes_tpu.engine import gibbs as G
from hibayes_tpu.engine.checkpoint import save_checkpoint


def build(n=120, m=64, B=32):
    rng = np.random.default_rng(2)
    M = rng.binomial(2, 0.3, size=(n, m)).astype(np.float64)
    y = M @ rng.normal(0, 0.1, m) + rng.normal(0, 1, n)
    import jax.numpy as jnp
    data = G.prepare_gibbs_data(y, M, block=B, dtype=jnp.float64)
    pi = np.array([0.95, 0.05])
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model="BayesCpi", n=n, m=m, m_pad=int(data.xpx.shape[0]), block=B,
        nc=0, nlevels=(), n_fold=2, niter=100, nburn=40, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, resync_every=0,
    )
    return data, spec, pr, pi


def test_segmented_matches_fast_path(tmp_path):
    data, spec, pr, pi = build()
    _, fast, exf = G.run_chain(spec, data, pr, pi, seed=9)
    _, seg, exs = G.run_chain(
        spec, data, pr, pi, seed=9,
        checkpoint_path=str(tmp_path / "ck"), chunk_records=3,
    )
    np.testing.assert_allclose(np.asarray(fast["alpha"]), seg["alpha"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fast["Vg"]), seg["Vg"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(exf["pip"]), np.asarray(exs["pip"]), rtol=1e-12)


def test_resume_after_kill(tmp_path):
    data, spec, pr, pi = build()
    base_key = jax.random.PRNGKey(9)
    # simulate a chain killed mid-run: burn + 4 records, then checkpoint
    state = G.init_state(spec, data, pr, pi)
    state = G._run_burn_segment(spec, spec.nburn, data, base_key, state)
    state, chunk = G._run_record_segment(spec, 4, data, base_key, state)
    partial = {k: np.asarray(v) for k, v in chunk.items()}
    save_checkpoint(str(tmp_path / "ck"), state, partial)

    # resume via the public API -> must equal the uninterrupted chain exactly
    _, resumed, _ = G.run_chain(
        spec, data, pr, pi, seed=9,
        checkpoint_path=str(tmp_path / "ck"), chunk_records=3,
    )
    _, full, _ = G.run_chain(spec, data, pr, pi, seed=9)
    np.testing.assert_allclose(np.asarray(full["alpha"]), resumed["alpha"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(full["mu"]), resumed["mu"], rtol=1e-12)


# -------------------------------------------------- summary-engine chunking
def build_s(m=96, B=16):
    import jax.numpy as jnp

    from hibayes_tpu.data.ld import ldmat
    from hibayes_tpu.engine import sgibbs as SG

    rng = np.random.default_rng(4)
    X = rng.binomial(2, 0.35, size=(300, m)).astype(np.int8)
    Xf = X.astype(np.float64)
    b = rng.normal(0, 0.3, m) * (rng.random(m) < 0.2)
    y = (Xf - Xf.mean(0)) @ b + rng.normal(0, 1, 300)
    vx = Xf.var(0)
    beta = ((Xf - Xf.mean(0)) * (y - y.mean())[:, None]).mean(0) / np.maximum(vx, 1e-12)
    se = np.sqrt(np.maximum(y.var() - beta**2 * vx, 1e-6) / (vx * 298))
    ss = np.column_stack([np.minimum(Xf.mean(0) / 2, 1 - Xf.mean(0) / 2),
                          beta, se, np.full(m, 300)])
    ld = ldmat(X)
    data, n_eff, vary, nvar0, seg_sizes, seg_real = SG.prepare_sgibbs_data(
        ss, ld, fold=np.array([0.0, 1.0]), block=B, dtype=np.float64)
    pi = np.array([0.95, 0.05])
    pr = G.resolve_priors(None, float(np.sum(np.asarray(ld.diag))), pi[0],
                          nr=0, vary=vary)
    spec = G.GibbsSpec(
        model="BayesCpi", n=n_eff, m=m, m_pad=int(sum(seg_sizes)), block=B,
        nc=0, nlevels=(), n_fold=2, niter=100, nburn=40, thin=5, nvar0=nvar0,
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, vargl_strict_pos=True,
        real_excl_nvar0=True, vary=vary, seg_sizes=seg_sizes, seg_real=seg_real,
    )
    return data, spec, pr, pi


def test_summary_segmented_matches_fast_path(tmp_path):
    from hibayes_tpu.engine import sgibbs as SG

    data, spec, pr, pi = build_s()
    _, fast, exf = SG.run_s_chain(spec, data, pr, pi, seed=5)
    _, seg, exs = SG.run_s_chain(
        spec, data, pr, pi, seed=5,
        checkpoint_path=str(tmp_path / "sck"), chunk_records=3,
    )
    np.testing.assert_allclose(np.asarray(fast["alpha"]), seg["alpha"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fast["Vg"]), np.asarray(seg["Vg"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(exf["pip"]), np.asarray(exs["pip"]), rtol=1e-12)


def test_summary_resume_after_kill(tmp_path):
    from hibayes_tpu.engine import sgibbs as SG

    data, spec, pr, pi = build_s()
    base_key = jax.random.PRNGKey(5)
    state = SG.init_s_state(spec, data, pr, pi)
    state = SG._run_s_burn_segment(spec, spec.nburn, data, base_key, state)
    state, chunk = SG._run_s_record_segment(spec, 4, data, base_key, state)
    partial = {k: np.asarray(v) for k, v in chunk.items()}
    save_checkpoint(str(tmp_path / "sck"), state, partial)

    _, resumed, _ = SG.run_s_chain(
        spec, data, pr, pi, seed=5,
        checkpoint_path=str(tmp_path / "sck"), chunk_records=3,
    )
    _, full, _ = SG.run_s_chain(spec, data, pr, pi, seed=5)
    np.testing.assert_allclose(np.asarray(full["alpha"]), resumed["alpha"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(full["Vg"]), np.asarray(resumed["Vg"]), rtol=1e-12)
