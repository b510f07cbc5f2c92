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
