"""Multi-host (multi-process) helpers over jax.distributed.

Net-new capability (the reference is single-process). On a TPU pod each host
runs the same program; ``initialize_distributed`` wires the JAX coordination
service, and ``host_local_batch_to_global`` assembles a globally-sharded batch
from each host's local shard so the data pipeline stays fully distributed:
every host loads and crops only its slice, and the NamedSharding spans the
whole mesh (collectives ride ICI, host work rides DCN only for coordination).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process args are absent).

    On Cloud TPU the arguments are auto-detected from the environment; pass
    them explicitly elsewhere (coordinator 'host:port', world size, rank).
    """
    if coordinator_address is None and num_processes is None:
        # Auto-detection path (TPU pod metadata) or single-process fallback.
        try:
            jax.distributed.initialize()
        except Exception as e:
            # In a genuine pod environment a failed init must NOT degrade to
            # single-process mode: other hosts that did initialize would
            # disagree on process_count() and hang in the first collective
            # (or shard data inconsistently) with the root cause discarded.
            import os

            pod_env = [k for k in (
                "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
            ) if os.environ.get(k)]
            if pod_env:
                raise RuntimeError(
                    "jax.distributed.initialize() failed although a pod "
                    f"environment is present ({', '.join(pod_env)} set)"
                ) from e
            # single process — nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_batch_slice(global_batch: int) -> slice:
    """The [start, stop) sample range this process should load/crop."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def host_local_batch_to_global(
    local_batch: np.ndarray, mesh: Mesh, data_axis: str = "data",
    space_axis: str = "",
) -> jax.Array:
    """Assemble a globally-sharded array from per-process local batches.

    ``local_batch`` holds only this process's samples; the result is a global
    array of shape (sum of local batches, ...) sharded over ``data_axis``
    (and, for dp×sp training, the height over ``space_axis`` — matching the
    train step's in_shardings so no reshard happens at the jit boundary).
    """
    dims = [None] * (local_batch.ndim - 1)
    if space_axis:
        dims[0] = space_axis
    spec = P(data_axis, *dims)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_batch
    )
