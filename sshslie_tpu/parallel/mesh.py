"""Mesh construction and sharding layouts for data-parallel training.

The reference is strictly single-device (SURVEY.md §2 preamble: no
torch.distributed anywhere), so everything here is net-new TPU design:

  * a 1-D ``data`` mesh over all local devices (or a user ``mesh_shape``);
  * batches enter sharded on the batch axis (NamedSharding, ICI all-reduce
    inserted by XLA for the loss/grad means);
  * params/optimizer state are replicated — this model is <1M params, so
    data-parallel with replicated state is the right point in the
    (DP, TP, FSDP) space; tensor sharding would only add collectives.

Multi-host note: under ``jax.distributed`` the same NamedSharding spans
processes; each host feeds only its addressable shard via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: str) -> Tuple[int, ...]:
    """'8' → (8,); '4x2' → (4, 2); '' → all devices on a 1-D mesh."""
    if not spec:
        return (len(jax.devices()),)
    return tuple(int(part) for part in spec.lower().split("x"))


def make_mesh(
    mesh_shape: str = "",
    axis_names: Optional[Sequence[str]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the given devices; default 1-D ('data',) over all."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    # Default shape sizes to the RESOLVED devices — parse_mesh_shape('')
    # counts the global device set, which is wrong for an explicit subset
    # (e.g. local_devices() on a pod).
    shape = parse_mesh_shape(mesh_shape) if mesh_shape else (devs.size,)
    if axis_names is None:
        # 2-D default data×space: the reference's workload trains at batch
        # 1-2 (config/config.yml:11), so a pure data mesh strands chips; the
        # second axis shards the patch height (spatial parallelism).
        if len(shape) > 2:
            raise ValueError(
                f"mesh_shape {mesh_shape!r} has {len(shape)} axes; the "
                "framework shards batch ('data') and height ('space') only — "
                "use a 1-D or 2-D shape, or pass axis_names explicitly"
            )
        axis_names = ("data",) if len(shape) == 1 else ("data", "space")
    elif len(axis_names) != len(shape):
        raise ValueError(
            f"axis_names {tuple(axis_names)} does not match mesh shape {shape}"
        )
    n_needed = int(np.prod(shape))
    if n_needed > devs.size:
        raise ValueError(f"mesh shape {shape} needs {n_needed} devices, have {devs.size}")
    return Mesh(devs[:n_needed].reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, data_axis: str = "data", ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def batch_space_sharding(
    mesh: Mesh, data_axis: str = "data", space_axis: str = "space"
) -> NamedSharding:
    """Shard (B, H, W, C) on batch AND height — dp×sp over a 2-D mesh.

    XLA GSPMD inserts the conv halo exchanges and attention gathers; no
    manual collectives. Use when batch_size < device count (the reference's
    batch 1-2 regime) so every chip still gets work.
    """
    return NamedSharding(mesh, P(data_axis, space_axis, None, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_size(global_batch: int, mesh: Mesh, data_axis: str = "data") -> int:
    """Validate the global batch divides the data axis; return per-device size."""
    n = mesh.shape[data_axis]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel size {n}"
        )
    return global_batch // n
