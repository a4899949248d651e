"""Chunked / row-range .bed ingestion (reference: src/read_bed.cpp:137-230).

The reference streams the .bed in `maxLine` byte buffers into a file-backed
bigmemory matrix; here the payload is memory-mapped and decoded in bounded
column chunks, with row-range decode for multi-host loading and imputation by
GLOBAL major genotype computed straight from the packed bytes.
"""

import numpy as np
import pytest

from hibayes_tpu.data import plink


def _write_bed(tmp_path, g, name="t"):
    n, m = g.shape
    (tmp_path / f"{name}.bed").write_bytes(plink.encode_bed_bytes(g))
    with open(tmp_path / f"{name}.bim", "w") as f:
        for j in range(m):
            f.write(f"1\tM{j}\t0\t{j + 1}\tA\tG\n")
    with open(tmp_path / f"{name}.fam", "w") as f:
        for i in range(n):
            f.write(f"F{i}\tI{i}\t0\t0\t0\t-9\n")
    return str(tmp_path / name)


@pytest.fixture
def geno():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 3, size=(13, 9)).astype(np.int8)  # n % 4 != 0: padding
    g[rng.random(g.shape) < 0.15] = -9
    return g


def test_decode_region_matches_full(tmp_path, geno):
    n, m = geno.shape
    bfile = _write_bed(tmp_path, geno)
    p2d = plink.bed_payload_memmap(bfile + ".bed", n, m)
    full = plink.decode_bed_region(p2d, n)
    np.testing.assert_array_equal(full, geno)
    # every (row range) x (col chunk), including unaligned row starts
    for r0, rc in [(0, n), (1, 5), (3, 7), (5, 8), (12, 1), (0, 0)]:
        for c0, cc in [(0, m), (2, 3), (8, 1), (0, 1)]:
            blk = plink.decode_bed_region(p2d, n, rows=(r0, rc), cols=(c0, cc))
            np.testing.assert_array_equal(blk, geno[r0 : r0 + rc, c0 : c0 + cc])


def test_decode_region_bounds(tmp_path, geno):
    n, m = geno.shape
    bfile = _write_bed(tmp_path, geno)
    p2d = plink.bed_payload_memmap(bfile + ".bed", n, m)
    with pytest.raises(ValueError):
        plink.decode_bed_region(p2d, n, rows=(10, 4))
    with pytest.raises(ValueError):
        plink.decode_bed_region(p2d, n, cols=(0, m + 1))


def test_geno_counts_exact_with_padding(tmp_path, geno):
    n, m = geno.shape
    bfile = _write_bed(tmp_path, geno)
    p2d = plink.bed_payload_memmap(bfile + ".bed", n, m)
    counts = plink.bed_geno_counts(p2d, n, max_chunk_bytes=8)  # force chunking
    for v in range(3):
        np.testing.assert_array_equal(counts[v], (geno == v).sum(axis=0))


def test_impute_with_counts_matches_impute_major(tmp_path, geno):
    n, m = geno.shape
    bfile = _write_bed(tmp_path, geno)
    p2d = plink.bed_payload_memmap(bfile + ".bed", n, m)
    counts = plink.bed_geno_counts(p2d, n)
    np.testing.assert_array_equal(
        plink.impute_major_with_counts(geno, counts), plink.impute_major(geno)
    )


def test_read_plink_chunked_equals_oneshot(tmp_path, geno):
    bfile = _write_bed(tmp_path, geno)
    big = plink.read_plink(bfile)["geno"].values
    tiny = plink.read_plink(bfile, max_chunk_bytes=16)["geno"].values
    np.testing.assert_array_equal(np.asarray(tiny), np.asarray(big))
    assert (np.asarray(big) != -9).all()


def test_read_plink_out_streams_to_memmap(tmp_path, geno):
    bfile = _write_bed(tmp_path, geno)
    out = str(tmp_path / "store" / "g")
    res = plink.read_plink(bfile, out=out, max_chunk_bytes=16)
    assert isinstance(res["geno"].values, np.memmap)
    reattached = plink.GenoMatrix.attach(out)
    np.testing.assert_array_equal(
        np.asarray(reattached.values), np.asarray(res["geno"].values)
    )


def test_read_plink_row_shard_global_imputation(tmp_path):
    # column where the LOCAL major genotype of a shard differs from the
    # GLOBAL one: shard rows 0-3 are mostly 2s, but globally 0 dominates
    g = np.array(
        [[2], [2], [-9], [2], [0], [0], [0], [0], [0], [0]], dtype=np.int8
    )
    bfile = _write_bed(tmp_path, g)
    full = plink.read_plink(bfile)["geno"].values
    shard = plink.read_plink(bfile, rows=(0, 4))["geno"].values
    np.testing.assert_array_equal(np.asarray(shard), np.asarray(full)[:4])
    assert shard[2, 0] == 0  # global major, not the shard-local 2


def test_read_plink_demo_streaming_equivalence():
    ref = "/root/reference/inst/extdata/demo"
    full = plink.read_plink(ref)["geno"].values
    chunked = plink.read_plink(ref, max_chunk_bytes=1 << 12)["geno"].values
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(full))
    lo = plink.read_plink(ref, rows=(100, 250))["geno"].values
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(full)[100:350])


def test_host_sharded_loader_single_process(tmp_path, geno):
    """process_row_range + load_plink_host_sharded on the 8-device CPU mesh
    (single process: the range is all rows; the global array must equal the
    full decode and carry the ind-axis sharding)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hibayes_tpu.parallel.distributed import (
        load_plink_host_sharded,
        process_row_range,
    )
    from hibayes_tpu.parallel.mesh import make_mesh

    g16 = np.vstack([geno, geno[:3]])  # 16 rows: divisible by 8 devices
    bfile = _write_bed(tmp_path, g16, name="h")
    mesh = make_mesh()
    assert process_row_range(16, mesh) == (0, 16)
    fileset, global_geno = load_plink_host_sharded(bfile, mesh)
    assert global_geno.sharding.is_equivalent_to(
        NamedSharding(mesh, P("ind", None)), 2
    )
    np.testing.assert_array_equal(
        np.asarray(global_geno), np.asarray(fileset["geno"].values)
    )
    assert not np.any(np.asarray(global_geno) == -9)
