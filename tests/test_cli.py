"""CLI smoke tests on demo data."""

import numpy as np

from hibayes_tpu.cli import main

DEMO = "/root/reference/inst/extdata/demo"


def test_cli_ibrm(tmp_path):
    out = str(tmp_path / "fit")
    rc = main(["ibrm", "--bfile", DEMO, "--pheno", DEMO + ".phe",
               "--formula", "T1~1", "--niter", "400", "--nburn", "200",
               "--quiet", "--out-prefix", out])
    assert rc == 0
    alpha = open(out + ".alpha.tsv").read().splitlines()
    assert alpha[0].split("\t") == ["SNP", "Chr", "Pos", "alpha", "pip"]
    assert len(alpha) == 1001
    gebv = open(out + ".gebv.tsv").read().splitlines()
    assert len(gebv) == 601


def test_cli_ldmat(tmp_path):
    out = str(tmp_path / "ld.npz")
    rc = main(["ldmat", "--bfile", DEMO, "--out", out, "--by-chr"])
    assert rc == 0
    z = np.load(out)
    assert str(z["kind"]) == "blockdiag"


def test_cli_ibrm_plots(tmp_path):
    import pytest

    pytest.importorskip("matplotlib")
    out = str(tmp_path / "fit")
    rc = main(["ibrm", "--bfile", DEMO, "--pheno", DEMO + ".phe",
               "--formula", "T1~1", "--niter", "200", "--nburn", "100",
               "--windsize", "1e6",
               "--quiet", "--out-prefix", out, "--plots"])
    assert rc == 0
    import os
    for suffix in (".pip.png", ".wppa.png", ".trace.png"):
        assert os.path.getsize(out + suffix) > 0
