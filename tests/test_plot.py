"""Plot module: Manhattan / QQ / trace / density render against a fit.

Counterpart of the reference's CMplot-based visualization (R/exports.R:17-19,
README.md:215-227).  Rendered headless on the Agg backend; assertions check
the figures actually contain the expected marks, and one end-to-end case
renders straight from a real `ibrm` fit on the demo data.
"""

import os

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from hibayes_tpu import plot
from hibayes_tpu.model.results import BlrMod


def _fake_fit(m=120, nw=12, records=50, seed=0):
    rng = np.random.default_rng(seed)
    chrom = np.repeat(["1", "2", "3"], nw // 3)
    fit = BlrMod(
        call="y ~ 1", model_desc="test", method="BayesCpi",
        pip=rng.uniform(size=m),
        gwas={
            "Wind": np.arange(1, nw + 1),
            "Chr": chrom,
            "N": np.full(nw, m // nw),
            "Start": np.arange(nw) * 1e6 + 1,
            "End": np.arange(nw) * 1e6 + 9e5,
            "WPPA": rng.uniform(size=nw),
        },
        MCMCsamples={
            "Vg": rng.normal(1.0, 0.1, records),
            "Ve": rng.normal(2.0, 0.2, records),
            "h2": rng.uniform(0.2, 0.4, records),
            "pi": rng.dirichlet([9, 1], size=records),
        },
    )
    return fit


def test_manhattan_pip_marks_and_save(tmp_path):
    fit = _fake_fit()
    m = len(fit.pip)
    map_ = {
        "Chr": np.repeat(["1", "2", "3"], m // 3),
        "Pos": np.tile(np.arange(1, m // 3 + 1) * 1e4, 3),
    }
    fig, ax = plot.manhattan_pip(fit, map_, threshold=0.9)
    # one scatter collection per chromosome + points total == m
    pts = sum(len(c.get_offsets()) for c in ax.collections)
    assert pts == m
    assert len(ax.collections) == 3
    assert len(ax.get_xticks()) == 3
    assert any(line.get_linestyle() == "--" for line in ax.lines)  # threshold
    out = tmp_path / "pip.png"
    fig.savefig(out)
    assert os.path.getsize(out) > 0


def test_manhattan_wppa_uses_window_midpoints():
    fit = _fake_fit()
    fig, ax = plot.manhattan_wppa(fit)
    pts = sum(len(c.get_offsets()) for c in ax.collections)
    assert pts == len(fit.gwas["WPPA"])
    assert ax.get_ylabel() == "WPPA"


def test_qqplot_identity_line_and_points():
    rng = np.random.default_rng(1)
    p = rng.uniform(size=500)
    fig, ax = plot.qqplot(p)
    assert len(ax.collections) == 1
    assert len(ax.collections[0].get_offsets()) == 500
    assert len(ax.lines) == 1  # identity reference


def test_trace_and_density_expand_vector_params():
    fit = _fake_fit()
    fig, axes = plot.trace(fit, params=("Vg", "h2", "pi"))
    # Vg + h2 + pi[1] + pi[2]
    assert len(axes) == 4
    assert axes[2].get_ylabel() == "pi[1]"
    fig2, axes2 = plot.density(fit, params=("Vg",))
    assert len(axes2) == 1
    assert len(axes2[0].patches) > 0  # histogram bars


def test_trace_unknown_param_raises():
    fit = _fake_fit()
    with pytest.raises(KeyError, match="no MCMC samples"):
        plot.trace(fit, params=("nope",))


def test_plots_from_real_fit():
    # end-to-end: a tiny real ibrm fit renders PIP + WPPA + traces
    from hibayes_tpu import ibrm
    from .test_ibrm import load_demo

    bin_, pheno = load_demo()
    fit = ibrm("T1 ~ sex", data=pheno, M=bin_["geno"].values,
               M_id=bin_["fam"][1], method="BayesCpi",
               map=bin_["map"], windsize=1e6,
               niter=200, nburn=100, verbose=False, seed=7)
    m = bin_["geno"].values.shape[1]
    fig, ax = plot.manhattan_pip(fit, bin_["map"])
    assert sum(len(c.get_offsets()) for c in ax.collections) == m
    plot.manhattan_wppa(fit)
    plot.trace(fit)
    plot.density(fit)
