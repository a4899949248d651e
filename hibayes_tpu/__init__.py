"""hibayes_tpu: TPU-native Bayesian whole-genome regression and GWAS.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the hibayes
R package (individual-level `ibrm`, summary-level `sbrm`, single-step
`ssbrm` Bayesian models, LD matrix construction, PLINK ingestion), designed
for TPU: blocked Gibbs on the MXU, mesh-sharded genotypes, psum-merged
residual updates over ICI.
"""

from .data.plink import read_plink, GenoMatrix
from .model.ibrm import ibrm
from .model.results import BlrMod

__all__ = ["read_plink", "GenoMatrix", "ibrm", "BlrMod"]
__version__ = "0.1.0"
