"""Device mesh + sharding helpers (net-new TPU capability; no reference counterpart)."""

from sshslie_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch_size,
)
