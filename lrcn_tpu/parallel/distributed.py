"""Multi-host (multi-process) runtime helpers.

The reference is a single process on one GPU — there is no distributed
communication backend at all (SURVEY.md §2/§5).  In this framework the
backend IS JAX/XLA: processes join a coordination service, every process
sees the global mesh, and GSPMD compiles collectives onto ICI (within a
slice) / DCN (across slices).  These helpers wrap the two host-side jobs
that remain:

- joining the cluster (``initialize``), and
- turning per-host input shards into global device arrays
  (``host_local_batch``) so the sharded train step (parallel/train.py)
  is identical single-host and multi-host.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the JAX coordination service (multi-host startup).

    A no-op when every argument is None and the environment provides no
    cluster configuration (single-process case) — so call sites can run
    unconditionally.
    """
    if (coordinator_address is None and num_processes is None
            and process_id is None and jax.process_count() == 1):
        try:
            jax.distributed.initialize()
        except Exception:
            return  # no cluster environment: stay single-process
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def host_local_batch(mesh: Mesh, batch_shard: Any,
                     spec: P = P("data")) -> Any:
    """Assemble global arrays from THIS process's slice of the batch.

    Each host loads only its own rows (1/process_count of the global
    batch); this stitches them into sharded global arrays without any
    host-side gather.  Single-process it degenerates to a device_put.
    """
    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.tree.map(one, batch_shard)
