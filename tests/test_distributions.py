"""Moment checks for the distribution samplers vs. analytic values."""

import jax
import jax.numpy as jnp
import numpy as np

from hibayes_tpu.math import distributions as D

KEY = jax.random.PRNGKey(0)
N = 200_000


def test_chisq_moments():
    for df in [1.0, 4.0, 50.0]:
        x = D.chisq(KEY, df, (N,), dtype=jnp.float64)
        assert abs(float(x.mean()) - df) < 0.05 * df + 0.05
        assert abs(float(x.var()) - 2 * df) < 0.1 * df + 0.3


def test_inv_chisq_mean():
    # scaled-inv-chi2(df, s) has mean df*s/(df-2)
    df, s = 10.0, 3.0
    x = D.inv_chisq(KEY, df, s, (N,), dtype=jnp.float64)
    assert abs(float(x.mean()) - df * s / (df - 2)) < 0.1


def test_inv_gaussian_moments():
    mu, lam = 2.0, 5.0
    x = D.inv_gaussian(KEY, mu, lam, (N,), dtype=jnp.float64)
    assert abs(float(x.mean()) - mu) < 0.02 * mu
    assert abs(float(x.var()) - mu**3 / lam) < 0.1 * mu**3 / lam


def test_dirichlet_mean():
    alpha = np.array([2.0, 3.0, 5.0])
    xs = jax.vmap(lambda k: D.dirichlet(k, alpha, dtype=jnp.float64))(
        jax.random.split(KEY, 20000)
    )
    np.testing.assert_allclose(np.mean(xs, axis=0), alpha / alpha.sum(), atol=0.01)


def test_laplace_moments():
    x = D.laplace(KEY, 1.0, 2.0, (N,), dtype=jnp.float64)
    assert abs(float(x.mean()) - 1.0) < 0.03
    assert abs(float(x.var()) - 2 * 4.0) < 0.2


def test_gamma_scale():
    x = D.gamma(KEY, 3.0, 2.0, (N,), dtype=jnp.float64)
    assert abs(float(x.mean()) - 6.0) < 0.1


def test_scaled_inv_chisq_from_matches_formula():
    chi = 4.0
    out = D.scaled_inv_chisq_from(10.0, 2.0, 6.0, chi)
    assert float(out) == (10.0 + 2.0) / 4.0


def test_estimate_diag_and_pcg_probe():
    """The probe-estimated Jacobi preconditioner (math/solvers.py::pcg) must
    approximate diag(A) and still converge to the true solve."""
    import jax.numpy as jnp
    import numpy as np
    from hibayes_tpu.math.solvers import estimate_diag, pcg

    rng = np.random.default_rng(3)
    B = rng.normal(size=(40, 40))
    A = B @ B.T + 40 * np.diag(1.0 + rng.random(40))
    Aj = jnp.asarray(A)
    matvec = lambda v: Aj @ v
    d = np.asarray(estimate_diag(matvec, 40, nprobes=256))
    # Rademacher estimate is unbiased; at 256 probes relative error is small
    assert np.allclose(d, np.diag(A), rtol=0.35)
    b = jnp.asarray(rng.normal(size=40))
    x, it = pcg(matvec, b, tol=1e-10)
    assert np.allclose(np.asarray(Aj @ x), np.asarray(b), atol=1e-6)
