"""PLINK binary (.bed/.bim/.fam) ingestion.

TPU-native replacement for the reference's out-of-core loader
(reference: R/read_plink.r:24-77, src/read_bed.cpp:97-232).  Design:

* the 2-bit .bed payload is decoded with a 256x4 lookup table — a single
  vectorised gather per byte-block instead of the reference's per-byte OpenMP
  loop; an optional C++/OpenMP codec (hibayes_tpu/native) accelerates very
  large files and is used when built;
* genotypes are stored as **int8** (0/1/2, -9 = missing before imputation):
  4x smaller than the reference's double copies crossing its FFI, and the
  natural feed for on-device int8->f32 conversion in the Pallas kernels;
* persistence mirrors the reference's .bin/.desc memory-mapped pair with a
  NumPy memmap + JSON descriptor so re-loading is O(1) (`attach`).

Coding matches the reference exactly: A1A1 -> 2, A1A2 -> 1, A2A2 -> 0
(additive, A1 counted) or A1A1/A2A2 -> 0, A1A2 -> 1 (dominant)
(reference: src/read_bed.cpp:116-127); missing imputed by the per-SNP major
genotype (src/read_bed.cpp:182-230).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

_MISS = np.int8(-9)

# PLINK 2-bit codes within a byte (little-endian pairs):
#   00 -> hom A1, 01 -> missing, 10 -> het, 11 -> hom A2
_CODE_A = np.array([2, -9, 1, 0], dtype=np.int8)   # additive: count A1
_CODE_D = np.array([0, -9, 1, 0], dtype=np.int8)   # dominant


def _byte_lut(mode: str) -> np.ndarray:
    """(256, 4) lookup: byte value -> 4 decoded genotypes."""
    code = _CODE_A if mode == "A" else _CODE_D
    b = np.arange(256, dtype=np.uint16)
    out = np.empty((256, 4), dtype=np.int8)
    for x in range(4):
        out[:, x] = code[(b >> (2 * x)) & 0x3]
    return out


_LUTS = {"A": _byte_lut("A"), "D": _byte_lut("D")}


def decode_bed_bytes(payload: np.ndarray, n: int, m: int, mode: str = "A",
                     threads: int = 0) -> np.ndarray:
    """Decode raw .bed payload (no magic) into an (n, m) int8 matrix.

    SNP-major layout: each SNP occupies ceil(n/4) bytes.  ``threads`` maps to
    the native codec's OpenMP thread count (0 = all cores), the analog of the
    reference's ``threads=`` argument (R/read_plink.r:24, src/omp_set.h:10-22);
    the NumPy fallback ignores it.
    """
    try:
        from hibayes_tpu.native import bed_codec  # optional C++ fast path

        if bed_codec.available():
            return bed_codec.decode(payload, n, m, mode, threads=threads)
    except ImportError:
        pass
    bpsnp = (n + 3) // 4
    if payload.size != bpsnp * m:
        raise ValueError(f".bed payload has {payload.size} bytes, expected {bpsnp * m}")
    lut = _LUTS[mode]
    # (m, bpsnp) bytes -> (m, bpsnp*4) genotypes -> trim padding -> (n, m)
    geno = lut[payload.reshape(m, bpsnp)].reshape(m, bpsnp * 4)[:, :n]
    return np.ascontiguousarray(geno.T)


def encode_bed_bytes(geno: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bed_bytes` (additive coding) — used to write
    test fixtures and to export data for PLINK interoperability."""
    n, m = geno.shape
    bpsnp = (n + 3) // 4
    # genotype value -> 2-bit code
    inv = {2: 0b00, -9: 0b01, 1: 0b10, 0: 0b11}
    codes = np.zeros((m, bpsnp * 4), dtype=np.uint8)
    gt = geno.T.astype(np.int64)
    for val, code in inv.items():
        codes[:, :n][gt == val] = code
    shifted = codes.reshape(m, bpsnp, 4) << np.array([0, 2, 4, 6], dtype=np.uint8)
    payload = shifted[..., 0] | shifted[..., 1] | shifted[..., 2] | shifted[..., 3]
    return b"\x6c\x1b\x01" + payload.astype(np.uint8).tobytes()


def impute_major(geno: np.ndarray, threads: int = 0) -> np.ndarray:
    """Impute missing (-9) entries with the per-SNP major genotype.

    Vectorised equivalent of the reference's per-SNP count loop
    (src/read_bed.cpp:182-230).  Ties resolve to the smaller genotype value
    only when its count is strictly greater, matching the reference's
    ``counts[j] > max`` scan order (0, then 1, then 2).  Uses the native
    OpenMP codec when built (``threads``: 0 = all cores).
    """
    miss = geno == _MISS
    cols = np.flatnonzero(miss.any(axis=0))
    if cols.size == 0:
        return geno
    try:
        from hibayes_tpu.native import bed_codec

        if bed_codec.available() and geno.dtype == np.int8:
            return bed_codec.impute_major_inplace(
                np.ascontiguousarray(geno.copy()), threads=threads
            )
    except ImportError:
        pass
    geno = geno.copy()
    for c in cols:
        col = geno[:, c]
        counts = np.array(
            [(col == 0).sum(), (col == 1).sum(), (col == 2).sum()], dtype=np.int64
        )
        major = np.int8(int(np.argmax(counts)))
        col[col == _MISS] = major
    return geno


def read_bim(path: str):
    """Parse .bim -> dict of columns SNP/Chr/Pos/A1/A2 (reference: read_bed.cpp:29-95)."""
    snp, chrom, pos, a1, a2 = [], [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            chrom.append(parts[0])
            snp.append(parts[1])
            pos.append(int(parts[3]))
            a1.append(parts[4])
            a2.append(parts[5])
    return {
        "SNP": np.array(snp),
        "Chr": np.array(chrom),
        "Pos": np.array(pos, dtype=np.int64),
        "A1": np.array(a1),
        "A2": np.array(a2),
    }


def read_fam(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                rows.append(parts)
    cols = max(len(r) for r in rows)
    return [np.array([r[i] if i < len(r) else "" for r in rows]) for i in range(cols)]


@dataclass
class GenoMatrix:
    """An (n individuals x m SNPs) int8 genotype matrix, optionally
    file-backed (NumPy memmap), with lazily computed column statistics.

    The analog of the reference's bigmemory-backed matrix (R/read_plink.r:57-65)
    minus the FFI: the array feeds jax.device_put / sharding directly.
    """

    values: np.ndarray  # int8, shape (n, m)
    path: str | None = None
    _stats: dict = field(default_factory=dict, repr=False)

    @property
    def n(self) -> int:
        return self.values.shape[0]

    @property
    def m(self) -> int:
        return self.values.shape[1]

    def col_stats(self, threads: int = 0):
        """Per-SNP mean / sum / sqrt(SSD), as in BigStat (src/tXXmat.cpp:43-98).
        Uses the native OpenMP codec for int8 storage when built."""
        if not self._stats:
            if self.values.dtype == np.int8:
                try:
                    from hibayes_tpu.native import bed_codec

                    if bed_codec.available():
                        self._stats = bed_codec.col_stats(
                            np.ascontiguousarray(self.values), threads=threads
                        )
                        return self._stats
                except ImportError:
                    pass
            g = self.values.astype(np.float64)
            mean = g.mean(axis=0)
            s = g.sum(axis=0)
            ssd = ((g - mean) ** 2).sum(axis=0)
            self._stats = {"mean": mean, "sum": s, "sqrt_ssd": np.sqrt(ssd)}
        return self._stats

    def save(self, prefix: str):
        """Persist as <prefix>.bin (+.desc JSON), mirroring the reference's
        memory-mapped persistence contract (R/read_plink.r:20)."""
        binpath = prefix + ".bin"
        mm = np.memmap(binpath, dtype=np.int8, mode="w+", shape=self.values.shape)
        mm[:] = self.values
        mm.flush()
        with open(prefix + ".desc", "w") as f:
            json.dump({"n": self.n, "m": self.m, "dtype": "int8"}, f)
        self.path = binpath
        return self

    @classmethod
    def attach(cls, prefix: str) -> "GenoMatrix":
        with open(prefix + ".desc") as f:
            desc = json.load(f)
        mm = np.memmap(prefix + ".bin", dtype=np.int8, mode="r", shape=(desc["n"], desc["m"]))
        return cls(values=mm, path=prefix + ".bin")


def read_plink(
    bfile: str,
    impute: bool = True,
    mode: str = "A",
    out: str | None = None,
    max_chunk_bytes: int = 1 << 30,
    threads: int = 0,
):
    """Load a PLINK binary fileset.

    Returns ``dict(fam=..., geno=GenoMatrix, map=...)`` matching the
    reference's surface (R/read_plink.r:24-77).  When ``out`` is given the
    genotype is persisted as a memmap pair plus ``<out>.id`` / ``<out>.map``.
    """
    if mode not in ("A", "D"):
        raise ValueError("mode must be 'A' (additive) or 'D' (dominant)")
    bim = read_bim(bfile + ".bim")
    fam = read_fam(bfile + ".fam")
    n = len(fam[0])
    m = len(bim["SNP"])
    with open(bfile + ".bed", "rb") as f:
        magic = f.read(3)
        if magic != b"\x6c\x1b\x01":
            raise ValueError(f"{bfile}.bed is not a SNP-major PLINK .bed file")
        payload = np.frombuffer(f.read(), dtype=np.uint8)
    geno = decode_bed_bytes(payload, n, m, mode, threads=threads)
    if impute:
        geno = impute_major(geno, threads=threads)
    gm = GenoMatrix(values=geno)
    if out is not None:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        gm.save(out)
        with open(out + ".id", "w") as f:
            f.write("\n".join(fam[1]) + "\n")
        with open(out + ".map", "w") as f:
            f.write("SNP\tChr\tPos\n")
            for s, c, p in zip(bim["SNP"], bim["Chr"], bim["Pos"]):
                f.write(f"{s}\t{c}\t{p}\n")
    return {"fam": fam, "geno": gm, "map": bim}
