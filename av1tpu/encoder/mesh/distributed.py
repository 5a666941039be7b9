"""Multi-host initialization (DCN story, SURVEY §5 "distributed
communication backend").

Within a slice, chips communicate over ICI via the collectives in
`sharding.py` / `specav1/jax_sharded.py`.  Across hosts, JAX's standard
distributed runtime carries DCN traffic: every process calls
`jax.distributed.initialize(...)` before first device use, after which
`jax.devices()` spans the whole pod and the same Mesh/shard_map code
scales unchanged (the scaling-book recipe: pick a mesh, annotate
shardings, let XLA place collectives on ICI within a slice and DCN
across).

The daemon enables this purely through environment variables so
single-host deployments pay nothing:

  AV1TPU_COORDINATOR=host0:8476   coordinator address (process 0's)
  AV1TPU_NUM_PROCESSES=4          total processes in the job
  AV1TPU_PROCESS_ID=2             this process's rank

`maybe_initialize()` is called from the engine bootstrap; without the
variables it is a no-op.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("av1tpu.engine")

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed from AV1TPU_* env vars.  Returns True
    when multi-host mode is active.  Safe to call repeatedly."""
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("AV1TPU_COORDINATOR")
    if not coord:
        return False
    nproc = int(os.environ.get("AV1TPU_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("AV1TPU_PROCESS_ID", "0"))
    import jax
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    log.info("jax.distributed initialized: %d processes, rank %d, "
             "coordinator %s", nproc, pid, coord)
    _initialized = True
    return True
