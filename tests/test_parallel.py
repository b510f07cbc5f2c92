"""Data-parallel correctness on the 8-device virtual CPU mesh: the sharded
train step must match the single-device step numerically, and the driver's
multichip dry run must pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sshslie_tpu.config import Config
from sshslie_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    parse_mesh_shape,
    replicated_sharding,
    shard_batch_size,
)
from sshslie_tpu.train import (
    TrainState,
    build_model,
    init_params,
    loss_coeffs,
    make_optimizer,
    make_train_step,
)


def test_parse_mesh_shape():
    assert parse_mesh_shape("") == (8,)
    assert parse_mesh_shape("4") == (4,)
    assert parse_mesh_shape("4x2") == (4, 2)


def test_make_mesh_and_validation():
    mesh = make_mesh("8")
    assert mesh.shape["data"] == 8
    with pytest.raises(ValueError):
        make_mesh("16")
    assert shard_batch_size(16, mesh) == 2
    with pytest.raises(ValueError):
        shard_batch_size(9, mesh)


def test_sharded_step_matches_single_device(rng):
    cfg = Config(channels=4, patch_size=16, attention_impl="xla")
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    coeffs = loss_coeffs(cfg)
    batch_np = rng.rand(8, 16, 16, 4).astype(np.float32)

    def fresh(p):
        # the train step donates its input state — each state needs own buffers
        return jax.tree.map(lambda x: jnp.array(x, copy=True), p)

    # single device
    p1 = fresh(params)
    s1 = TrainState(params=p1, opt_state=tx.init(p1),
                    step=jnp.zeros((), jnp.int32))
    step1 = make_train_step(model, tx, coeffs)
    s1, t1 = step1(s1, jnp.asarray(batch_np), jnp.float32(1e-3))

    # 8-device mesh
    mesh = make_mesh("8")
    p8 = fresh(params)
    s8 = TrainState(params=p8, opt_state=tx.init(p8),
                    step=jnp.zeros((), jnp.int32))
    s8 = jax.device_put(s8, replicated_sharding(mesh))
    batch = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
    step8 = make_train_step(model, tx, coeffs, mesh=mesh)
    s8, t8 = step8(s8, batch, jnp.float32(1e-3))

    assert float(t8["total_loss"]) == pytest.approx(float(t1["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # sharded grad-mean reduction order differs slightly from dense
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5)


def test_sharded_multi_step_stability(rng):
    """Several sharded steps keep replicated params in sync across devices."""
    cfg = Config(channels=4, patch_size=16, attention_impl="xla")
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    mesh = make_mesh("8")
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(model, tx, loss_coeffs(cfg), mesh=mesh)
    for i in range(3):
        batch = jax.device_put(
            jnp.asarray(rng.rand(8, 16, 16, 4).astype(np.float32)),
            batch_sharding(mesh),
        )
        state, terms = step(state, batch, jnp.float32(1e-3))
        assert np.isfinite(float(terms["total_loss"]))
    assert int(state.step) == 3


def test_dp_sp_step_matches_single_device(rng):
    """2-D data×space mesh (2×4): batch AND height sharded; numerics must
    match the dense single-device step (GSPMD halo exchanges are exact)."""
    from sshslie_tpu.parallel.mesh import batch_space_sharding

    cfg = Config(channels=4, patch_size=32, attention_impl="xla")
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    coeffs = loss_coeffs(cfg)
    batch_np = rng.rand(2, 32, 32, 4).astype(np.float32)

    def fresh(p):
        return jax.tree.map(lambda x: jnp.array(x, copy=True), p)

    p1 = fresh(params)
    s1 = TrainState(params=p1, opt_state=tx.init(p1), step=jnp.zeros((), jnp.int32))
    s1, t1 = make_train_step(model, tx, coeffs)(s1, jnp.asarray(batch_np),
                                                jnp.float32(1e-3))

    mesh = make_mesh("2x4")
    assert mesh.shape == {"data": 2, "space": 4}
    p2 = fresh(params)
    s2 = TrainState(params=p2, opt_state=tx.init(p2), step=jnp.zeros((), jnp.int32))
    s2 = jax.device_put(s2, replicated_sharding(mesh))
    batch = jax.device_put(jnp.asarray(batch_np), batch_space_sharding(mesh))
    step = make_train_step(model, tx, coeffs, mesh=mesh, space_axis="space")
    s2, t2 = step(s2, batch, jnp.float32(1e-3))

    assert float(t2["total_loss"]) == pytest.approx(float(t1["total_loss"]), rel=1e-5)
    # atol 5e-5: GSPMD's 8-shard reduction order differs from the dense
    # single-device sum; Adam's rsqrt normalization amplifies the resulting
    # ulp-scale gradient differences into ~2e-5 first-step param deltas.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5)


def test_fused_step_dp_sp(rng):
    """Fused on-device sampling under a data×space mesh runs and is finite."""
    from sshslie_tpu.train import make_fused_train_step

    cfg = Config(channels=4, patch_size=32, attention_impl="xla")
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    mesh = make_mesh("2x4")
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    state = jax.device_put(state, replicated_sharding(mesh))
    cubes = jax.device_put(jnp.asarray(rng.rand(3, 48, 48, 4).astype(np.float32)),
                           replicated_sharding(mesh))
    step = make_fused_train_step(model, tx, loss_coeffs(cfg), batch_size=2,
                                 patch_size=32, mesh=mesh, space_axis="space")
    state, terms = step(state, cubes, jax.random.PRNGKey(0), jnp.int32(0),
                        jnp.float32(1e-3))
    assert np.isfinite(float(terms["total_loss"]))
    assert int(state.step) == 1


def test_prefetcher_process_slice_assembles_global_batch(rng):
    """Single-process degenerate case of the multi-host pipeline: the full
    slice assembles a global array identical to the sampled batch, sharded on
    the data axis."""
    from sshslie_tpu.data.datasets import Prefetcher
    from sshslie_tpu.parallel.distributed import process_batch_slice

    mesh = make_mesh("8")
    batches = [rng.rand(8, 4, 4, 3).astype(np.float32) for _ in range(3)]
    sl = process_batch_slice(8)  # one process → slice(0, 8)
    assert sl == slice(0, 8)
    out = list(Prefetcher(iter(batches), process_slice=sl, mesh=mesh))
    assert len(out) == 3
    for got, want in zip(out, batches):
        assert got.sharding.spec[0] == "data"
        np.testing.assert_array_equal(np.asarray(got), want)


def test_prefetcher_process_slice_requires_mesh():
    from sshslie_tpu.data.datasets import Prefetcher

    with pytest.raises(ValueError):
        Prefetcher(iter([]), process_slice=slice(0, 4))


def test_trainer_fit_host_pipeline_on_mesh(tmp_path, rng):
    """Trainer.fit over the 8-device mesh with the host (non-fused) pipeline —
    the path multi-host runs take, minus extra processes."""
    import os

    import scipy.io as sio

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.makedirs("cubes", exist_ok=True)
        # Two cube shapes → stack_cubes fails → host pipeline selected.
        sio.savemat("cubes/a.mat", {"data": (rng.rand(24, 24, 4) * 100).astype(np.float32)})
        for i in range(7):
            sio.savemat(f"cubes/b{i}.mat", {"data": (rng.rand(32, 32, 4) * 100).astype(np.float32)})
        from sshslie_tpu.data.datasets import CubeStore
        from sshslie_tpu.train import Trainer

        store = CubeStore("cubes", normalization="self")
        cfg = Config(channels=4, patch_size=16, batch_size=8, epoch=2,
                     eval_every_epoch=100, plot_every_epoch=100,
                     attention_impl="xla", mesh_shape="8")
        cfg.finalize()
        trainer = Trainer(cfg, channels=4, mesh=make_mesh("8"))
        trainer.fit(store, ckpt_dir="ck")
        assert len(trainer.all_epoch_losses["total_loss"]) == 2
        assert all(np.isfinite(v) for v in trainer.all_epoch_losses["total_loss"])
    finally:
        os.chdir(cwd)


def test_driver_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_driver_entry_compiles():
    import __graft_entry__

    fn, (params, x) = __graft_entry__.entry()
    out = jax.jit(fn)(params, x)
    R, I, Id, S = out
    assert S.shape == x.shape


def test_elastic_remesh_resume(tmp_path, rng):
    """Checkpoint written single-device restores onto an 8-device mesh (and
    back) with identical continued training — elastic device-count changes
    between runs just work because state is replicated."""
    from sshslie_tpu import checkpoints

    cfg = Config(channels=4, patch_size=16, attention_impl="xla")
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    batch_np = rng.rand(8, 16, 16, 4).astype(np.float32)

    # Train 2 steps single-device, checkpoint.
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step1 = make_train_step(model, tx, loss_coeffs(cfg))
    for _ in range(2):
        state, _ = step1(state, jnp.asarray(batch_np), jnp.float32(1e-3))
    path = checkpoints.save_checkpoint(str(tmp_path / "ck"), state.params,
                                       state.opt_state, epoch=2)
    # Continue single-device (oracle).
    ref = state
    for _ in range(2):
        ref, _ = step1(ref, jnp.asarray(batch_np), jnp.float32(1e-3))

    # Restore onto an 8-device mesh and continue there.
    mesh = make_mesh("8")
    p0 = init_params(model, 0, cfg.patch_size)
    p8, o8, epoch = checkpoints.load_checkpoint(path, p0, tx.init(p0))
    assert epoch == 2
    s8 = TrainState(params=p8, opt_state=o8, step=jnp.asarray(2, jnp.int32))
    s8 = jax.device_put(s8, replicated_sharding(mesh))
    step8 = make_train_step(model, tx, loss_coeffs(cfg), mesh=mesh)
    for _ in range(2):
        batch = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
        s8, _ = step8(s8, batch, jnp.float32(1e-3))

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_grad_accum_step_on_mesh(rng):
    """make_accum_train_step compiles + executes under dp and dp×sp meshes
    (the scan's microbatch reshape splits the sharded batch dim; GSPMD keeps
    the partitioning)."""
    from sshslie_tpu.parallel.mesh import batch_space_sharding
    from sshslie_tpu.train import make_accum_train_step

    cfg = Config(channels=4, patch_size=32, batch_size=8, attention_impl="xla")
    model = build_model(cfg, 4)
    tx = make_optimizer()
    coeffs = loss_coeffs(cfg)
    batch_np = rng.rand(8, 32, 32, 4).astype(np.float32)
    losses = []
    for shape, space in (("8", ""), ("2x4", "space")):
        mesh = make_mesh(shape)
        p = init_params(model, 0, 32)
        st = jax.device_put(
            TrainState(params=p, opt_state=tx.init(p), step=jnp.zeros((), jnp.int32)),
            replicated_sharding(mesh),
        )
        shard = (batch_space_sharding(mesh) if space
                 else batch_sharding(mesh))
        batch = jax.device_put(jnp.asarray(batch_np), shard)
        step = make_accum_train_step(model, tx, coeffs, accum_steps=2,
                                     mesh=mesh, space_axis=space)
        st, terms = step(st, batch, jnp.float32(1e-3))
        losses.append(float(terms["total_loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
