"""Multi-host execution helpers.

The reference is a single-process OpenMP library (SURVEY.md §2.3 P5: no
MPI/NCCL/sockets).  Here, multi-host scaling uses JAX's standard runtime:

* `init_multihost()` wraps `jax.distributed.initialize` — call once per host
  before any device use (coordinator address/process id come from the
  environment or arguments).
* The SAME named shardings used single-host (`parallel/mesh.py`) then span
  all hosts: `make_mesh()` over `jax.devices()` returns a global mesh; the
  `ind` axis psums ride ICI within a slice, DCN only carries the replicated
  scalar state broadcast and checkpoint IO.

Single-controller-per-host SPMD: every host runs the identical `run_chain`
call; jax.Array global sharding handles the data placement.  Genotype
loading should be host-sharded: each host reads only its row shard of the
PLINK file (`data/plink.py` decodes any row range via the column-major .bed
layout) and hands `jax.make_array_from_process_local_data` the local shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def init_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (no-op if already initialized
    or single-process)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    return jax.process_count(), jax.process_index()


def host_sharded_genotype(local_rows: np.ndarray, mesh, axis="ind"):
    """Assemble a global (n, m) genotype jax.Array from this host's row shard.

    local_rows: this process's contiguous block of individuals (row order by
    process_index).  Returns a global array sharded over `axis`.
    """
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.make_array_from_process_local_data(sharding, local_rows)
