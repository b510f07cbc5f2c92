"""Worker for the true multi-process test (tests/test_multiprocess.py).

Each worker joins a 2-process jax.distributed cluster on the CPU backend
(4 virtual devices per process → 8 global), runs Trainer.fit's host data
pipeline for 2 epochs over a shared synthetic dataset, and dumps its epoch
losses as JSON. Not collected by pytest (no test_ prefix).

Usage: python _mp_train_worker.py <port> <rank> <world> <data_dir> <out_prefix> [pipeline]

``pipeline`` is ``host`` (default: per-process batch slices through the
Prefetcher), ``fused`` (replicated on-device cube stack via
jax.make_array_from_process_local_data, sampling inside the jitted step), or
``host_eval`` (host pipeline + per-epoch evaluation into a PER-RANK result
dir — exercises the multi-host single-writer eval gate: only rank 0's dir
may receive epoch outputs).
"""

import json
import os
import sys

port, rank, world, data_dir, out_prefix = sys.argv[1:6]
pipeline = sys.argv[6] if len(sys.argv) > 6 else "host"
rank, world = int(rank), int(world)

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import torch  # noqa: F401  (must precede jax; see tests/conftest.py)
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=world, process_id=rank
)
assert jax.process_count() == world, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert len(jax.devices()) == 4 * world, len(jax.devices())

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sshslie_tpu.config import Config  # noqa: E402
from sshslie_tpu.data.datasets import CubeStore  # noqa: E402
from sshslie_tpu.parallel.mesh import make_mesh  # noqa: E402
from sshslie_tpu.train import Trainer  # noqa: E402

cfg = Config(
    channels=4, patch_size=16, batch_size=8, epoch=2,
    eval_every_epoch=1 if pipeline == "host_eval" else 100,
    plot_every_epoch=100, attention_impl="xla",
    fused_pipeline="on" if pipeline == "fused" else "off",
    sampler="python", mesh_shape="8",
)
cfg.finalize()
store = CubeStore(data_dir, normalization="self")
mesh = make_mesh("8")
trainer = Trainer(cfg, channels=4, mesh=mesh)
fit_kwargs = {}
if pipeline == "host_eval":
    from sshslie_tpu.evaluate import evaluate_model

    fit_kwargs = dict(
        eval_store=store, evaluator=evaluate_model,
        # Per-rank result dir: after the single-writer gate only rank 0's
        # may gain epoch_N subdirectories.
        eval_result_dir=f"{out_prefix}_eval{rank}",
    )
trainer.fit(store, ckpt_dir=f"{out_prefix}_ck{rank}", **fit_kwargs)

with open(f"{out_prefix}.{rank}.json", "w") as fh:
    json.dump(trainer.all_epoch_losses, fh)
print(f"worker {rank} done")
