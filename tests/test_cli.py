"""CLI smoke tests on demo data."""

import numpy as np
import pytest

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


def test_cli_sbrm(tmp_path):
    out = str(tmp_path / "sfit")
    rc = main(["sbrm", "--sumstat", DEMO + ".ma", "--bfile", DEMO,
               "--method", "BayesCpi", "--niter", "400", "--nburn", "200",
               "--quiet", "--out-prefix", out])
    assert rc == 0
    alpha = open(out + ".alpha.tsv").read().splitlines()
    assert len(alpha) == 1001
    var = dict(
        line.split("\t") for line in open(out + ".var.tsv").read().splitlines()[1:]
    )
    assert float(var["Vg"]) > 0 and float(var["Ve"]) > 0


def test_cli_sbrm_sparse_chisq(tmp_path):
    out = str(tmp_path / "sfit")
    rc = main(["sbrm", "--sumstat", DEMO + ".ma", "--bfile", DEMO,
               "--chisq", "5", "--niter", "200", "--nburn", "100",
               "--quiet", "--out-prefix", out])
    assert rc == 0
    assert len(open(out + ".alpha.tsv").read().splitlines()) == 1001


def test_cli_ssbrm(tmp_path):
    out = str(tmp_path / "ssfit")
    rc = main(["ssbrm", "--bfile", DEMO, "--pheno", DEMO + ".phe",
               "--formula", "T1~1", "--ped", DEMO + ".ped",
               "--niter", "300", "--nburn", "150",
               "--quiet", "--out-prefix", out])
    assert rc == 0
    gebv = open(out + ".gebv.tsv").read().splitlines()
    # single-step GEBV covers every pedigree id (1500+), not just genotyped
    assert len(gebv) > 1000
    var = dict(
        line.split("\t") for line in open(out + ".var.tsv").read().splitlines()[1:]
    )
    assert float(var["Vg"]) > 0


def test_cli_sbrm_tiled(tmp_path):
    out = str(tmp_path / "tfit")
    rc = main(["sbrm", "--sumstat", DEMO + ".ma", "--bfile", DEMO,
               "--chisq", "5", "--tiled", "--tile", "64", "--stripe", "256",
               "--niter", "200", "--nburn", "100",
               "--quiet", "--out-prefix", out])
    assert rc == 0
    assert len(open(out + ".alpha.tsv").read().splitlines()) == 1001


def test_cli_ldmat_tiled(tmp_path):
    import numpy as np

    out = str(tmp_path / "ld_tiled.npz")
    rc = main(["ldmat", "--bfile", DEMO, "--out", out, "--chisq", "5",
               "--tiled", "--tile", "64", "--stripe", "256", "--quiet"])
    assert rc == 0
    z = np.load(out)
    assert str(z["kind"]) == "tiled" and int(z["m"]) == 1000
    assert z["tiles"].shape[2] == 64


@pytest.mark.slow
def test_cli_ssbrm_pcg(tmp_path):
    out = str(tmp_path / "sspcg")
    rc = main(["ssbrm", "--bfile", DEMO, "--pheno", DEMO + ".phe",
               "--formula", "T1~1", "--ped", DEMO + ".ped",
               "--impute", "pcg", "--niter", "200", "--nburn", "100",
               "--quiet", "--out-prefix", out])
    assert rc == 0
    assert len(open(out + ".gebv.tsv").read().splitlines()) > 1000


def test_cli_ibrm_sharded_pipeline(tmp_path):
    """--shards/--shard-schedule reach the m-MP mesh path from the CLI."""
    out = str(tmp_path / "fitp")
    rc = main(["ibrm", "--bfile", DEMO, "--pheno", DEMO + ".phe",
               "--formula", "T1~1", "--niter", "120", "--nburn", "60",
               "--quiet", "--out-prefix", out, "--nchains", "2",
               "--shards", "2", "--shard-schedule", "pipeline"])
    assert rc == 0
    alpha = open(out + ".alpha.tsv").read().splitlines()
    assert len(alpha) == 1001
