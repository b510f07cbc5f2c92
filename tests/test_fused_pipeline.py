"""Fully-fused on-device pipeline: sampling semantics, training integration,
mesh variant, and fallback behavior for mixed-size datasets."""

import os

import numpy as np
import pytest
import scipy.io as sio

import jax
import jax.numpy as jnp

from sshslie_tpu.config import Config
from sshslie_tpu.data.datasets import CubeStore
from sshslie_tpu.parallel.mesh import make_mesh, replicated_sharding
from sshslie_tpu.train import (
    TrainState,
    Trainer,
    build_model,
    init_params,
    loss_coeffs,
    make_fused_train_step,
    make_optimizer,
    stack_cubes,
)


def _store(tmp_path, rng, shapes=((40, 48, 6),) * 3):
    d = tmp_path / "cubes"
    d.mkdir(parents=True, exist_ok=True)
    for i, (h, w, c) in enumerate(shapes):
        sio.savemat(d / f"c{i}.mat", {"data": rng.rand(h, w, c).astype(np.float32)})
    return CubeStore(str(d), normalization=None)


def test_stack_cubes(tmp_path, rng):
    store = _store(tmp_path, rng)
    stacked = stack_cubes(store)
    assert stacked.shape == (3, 40, 48, 6)
    mixed = _store(tmp_path / "m", rng, shapes=((40, 48, 6), (32, 48, 6)))
    assert stack_cubes(mixed) is None


def test_fused_step_trains(tmp_path, rng):
    store = _store(tmp_path, rng)
    cubes = stack_cubes(store)
    cfg = Config(channels=6, patch_size=16, batch_size=2, attention_impl="xla")
    model = build_model(cfg, 6)
    params = init_params(model, 0, 16)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_fused_train_step(model, tx, loss_coeffs(cfg),
                                 batch_size=2, patch_size=16)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        state, terms = step(state, cubes, jax.random.fold_in(key, i),
                            jnp.int32(0), jnp.float32(1e-3))
        losses.append(float(terms["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


@pytest.mark.parametrize("remat", [False, True])
def test_fused_step_on_mesh(tmp_path, rng, remat):
    store = _store(tmp_path, rng)
    cubes = stack_cubes(store)
    mesh = make_mesh("8")
    cfg = Config(channels=6, patch_size=16, batch_size=8, attention_impl="xla",
                 remat=remat)
    model = build_model(cfg, 6)
    params = init_params(model, 0, 16)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    state = jax.device_put(state, replicated_sharding(mesh))
    cubes = jax.device_put(cubes, replicated_sharding(mesh))
    step = make_fused_train_step(model, tx, loss_coeffs(cfg),
                                 batch_size=8, patch_size=16, mesh=mesh)
    state, terms = step(state, cubes, jax.random.PRNGKey(1),
                        jnp.int32(0), jnp.float32(1e-3))
    assert np.isfinite(float(terms["total_loss"]))


def test_trainer_uses_fused_pipeline(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    store = _store(tmp_path, rng)
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=2,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="on")
    cfg.finalize()
    trainer = Trainer(cfg, channels=6)
    trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
    assert ("fused", False) in trainer._steps
    assert len(trainer.all_epoch_losses["total_loss"]) == 2
    assert all(np.isfinite(v) for v in trainer.all_epoch_losses["total_loss"])


def test_trainer_falls_back_on_mixed_sizes(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    store = _store(tmp_path, rng, shapes=((40, 48, 6), (36, 44, 6)))
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=1,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="auto")
    cfg.finalize()
    trainer = Trainer(cfg, channels=6)
    trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
    assert ("fused", False) not in trainer._steps  # host path used
    assert False in trainer._steps

    cfg2 = Config(channels=6, patch_size=16, batch_size=2, epoch=1,
                  attention_impl="xla", fused_pipeline="on")
    cfg2.finalize()
    trainer2 = Trainer(cfg2, channels=6)
    with pytest.raises(ValueError, match="fused_pipeline"):
        trainer2.fit(store, ckpt_dir=str(tmp_path / "ck2"))


def test_multistep_matches_per_step_trajectory(tmp_path, rng):
    """K-steps-per-dispatch scan must reproduce the per-step fused path
    bit-for-bit (same RNG folds, same cyclic cube indexing)."""
    from sshslie_tpu.train import make_multistep_train_step

    store = _store(tmp_path, rng, shapes=((40, 48, 6),) * 4)
    cubes = stack_cubes(store)
    cfg = Config(channels=6, patch_size=16, batch_size=2, attention_impl="xla")
    model = build_model(cfg, 6)
    params = init_params(model, 0, 16)
    tx = make_optimizer()
    base_key = jax.random.PRNGKey(7)

    def fresh():
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        return TrainState(params=p, opt_state=tx.init(p),
                          step=jnp.zeros((), jnp.int32))

    # per-step fused path: 4 dispatches (num_batches=2, 2 epochs worth)
    step1 = make_fused_train_step(model, tx, loss_coeffs(cfg),
                                  batch_size=2, patch_size=16)
    s1 = fresh()
    terms1 = []
    for step_id in range(4):
        batch_id = step_id % 2
        key = jax.random.fold_in(base_key, step_id)
        s1, t = step1(s1, cubes, key, jnp.int32(batch_id * 2), jnp.float32(1e-3))
        terms1.append(float(t["total_loss"]))

    # multistep: one dispatch covering the same 4 steps
    stepk = make_multistep_train_step(model, tx, loss_coeffs(cfg),
                                      batch_size=2, patch_size=16)
    s2 = fresh()
    step_ids = jnp.asarray([0, 1, 2, 3], jnp.uint32)
    batch_starts = jnp.asarray([0, 2, 0, 2], jnp.int32)
    valid = jnp.ones(4, bool)
    s2, tk = stepk(s2, cubes, base_key, step_ids, batch_starts, valid,
                   jnp.float32(1e-3))

    assert int(s2.step) == 4
    assert float(tk["total_loss"]) == pytest.approx(sum(terms1), rel=1e-5)
    # Same trajectory up to XLA reassociation between the scan body and the
    # standalone step: Adam's m/(√v+ε) turns float32 noise on noise-dominated
    # (near-zero-gradient) weights into up-to-one-full-step divergence, so a
    # tiny fraction of elements can differ by ~lr. Require the bulk exact-ish
    # and everything bounded by a couple of step sizes.
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params))
    ])
    assert np.quantile(diffs, 0.999) < 5e-4, np.quantile(diffs, 0.999)
    assert diffs.max() < 3e-3, diffs.max()


def test_trainer_steps_per_dispatch(tmp_path, rng, monkeypatch):
    """Trainer with steps_per_dispatch>1 trains through the scan path and
    records the same number of per-epoch averages."""
    monkeypatch.chdir(tmp_path)
    store = _store(tmp_path, rng, shapes=((40, 48, 6),) * 4)
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=2,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="on",
                 steps_per_dispatch=2)
    cfg.finalize()
    trainer = Trainer(cfg, channels=6)
    trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
    assert ("multistep", False) in trainer._steps
    assert ("fused", False) not in trainer._steps
    assert len(trainer.all_epoch_losses["total_loss"]) == 2
    assert all(np.isfinite(v) for v in trainer.all_epoch_losses["total_loss"])


def test_trainer_remainder_chunk_matches_per_step(tmp_path, rng, monkeypatch):
    """num_batches=3 with steps_per_dispatch=2 pads the [2,1] chunks to one
    scan length; the masked no-op must leave the trajectory identical to a
    steps_per_dispatch=1 run."""
    monkeypatch.chdir(tmp_path)
    store = _store(tmp_path, rng, shapes=((40, 48, 6),) * 6)  # 3 batches of 2
    base = dict(channels=6, patch_size=16, batch_size=2, epoch=2,
                eval_every_epoch=100, plot_every_epoch=100,
                attention_impl="xla", fused_pipeline="on")

    cfg1 = Config(**base, steps_per_dispatch=1)
    cfg1.finalize()
    t1 = Trainer(cfg1, channels=6)
    t1.fit(store, ckpt_dir=str(tmp_path / "ck1"))

    cfg2 = Config(**base, steps_per_dispatch=2)
    cfg2.finalize()
    t2 = Trainer(cfg2, channels=6)
    t2.fit(store, ckpt_dir=str(tmp_path / "ck2"))

    # epoch-average losses agree (each epoch = 3 real steps in both runs;
    # rtol covers Adam-amplified float noise compounding into epoch 2)
    np.testing.assert_allclose(t1.all_epoch_losses["total_loss"],
                               t2.all_epoch_losses["total_loss"], rtol=5e-4)
    assert int(t2.state.step) == int(t1.state.step) == 6
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(t1.state.params),
                        jax.tree.leaves(t2.state.params))
    ])
    assert np.quantile(diffs, 0.999) < 5e-4
    assert diffs.max() < 3e-3


# ---- windowed fused pipeline (fused_window; larger-than-HBM datasets) ----

def _lazy_store(tmp_path, rng, n=4, shape=(40, 48, 6), cache=2):
    from sshslie_tpu.data.datasets import LazyCubeStore

    d = tmp_path / "lazy_cubes"
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        h, w, c = shape
        sio.savemat(d / f"c{i}.mat", {"data": rng.rand(h, w, c).astype(np.float32)})
    return LazyCubeStore(str(d), normalization=None, cache_size=cache)


def test_window_feeder_rotation_semantics(tmp_path, rng):
    """W_e = [(e·K + j) mod N]: advances K per epoch, covers all cubes with
    period ceil(N/K), and is a pure function of the epoch (resume-safe)."""
    from sshslie_tpu.train import WindowedCubeFeeder

    store = _lazy_store(tmp_path, rng, n=5)
    feeder = WindowedCubeFeeder(store, 2, lambda a: a)
    try:
        assert feeder.indices(0) == [0, 1]
        assert feeder.indices(1) == [2, 3]
        assert feeder.indices(2) == [4, 0]
        seen = set()
        for e in range(3):  # ceil(5/2) epochs cover every cube
            seen.update(feeder.indices(e))
        assert seen == set(range(5))
        # window() returns the stack for its epoch regardless of call order
        w1 = np.asarray(feeder.window(1))
        np.testing.assert_array_equal(w1[0], store[2])
        np.testing.assert_array_equal(w1[1], store[3])
    finally:
        feeder.close()


def test_trainer_windowed_fused_pipeline(tmp_path, rng, monkeypatch):
    """A LazyCubeStore dataset trains through the windowed fused path: the
    fused step compiles, losses are finite, and the store's load counter
    shows the window rotating through disk (not a one-shot stack)."""
    monkeypatch.chdir(tmp_path)
    store = _lazy_store(tmp_path, rng, n=4, cache=2)
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=3,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="auto", fused_window=2)
    cfg.finalize()
    trainer = Trainer(cfg, channels=6)
    trainer.fit(store, ckpt_dir=str(tmp_path / "ckw"))
    assert ("fused", False) in trainer._steps
    assert len(trainer.all_epoch_losses["total_loss"]) == 3
    assert all(np.isfinite(v) for v in trainer.all_epoch_losses["total_loss"])
    # 3 trained epochs, 2 cubes each, LRU of 2 with disjoint rotating
    # windows ⇒ every window is loaded from disk; no prefetch happens past
    # the final epoch (num_epochs is passed through), so exactly 6 loads.
    assert store.load_count == 6


def test_windowed_resume_replays_trajectory(tmp_path, rng, monkeypatch):
    """Interrupted windowed training resumes onto the exact trajectory of an
    uninterrupted run: the window is a function of the epoch index and the
    fused RNG folds on the absolute step id."""
    monkeypatch.chdir(tmp_path)
    store = _lazy_store(tmp_path, rng, n=4, cache=2)

    def run(epochs, resume, ck):
        cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=epochs,
                     eval_every_epoch=2, plot_every_epoch=100,
                     attention_impl="xla", fused_pipeline="auto",
                     fused_window=2, resume=resume)
        cfg.finalize()
        t = Trainer(cfg, channels=6)
        t.fit(store, ckpt_dir=str(tmp_path / ck))
        return t.all_epoch_losses["total_loss"]

    straight = run(4, False, "ck_a")
    first = run(2, False, "ck_b")          # checkpoints at epoch 2
    resumed = run(4, True, "ck_b")         # resumes from epoch 2
    np.testing.assert_allclose(first, straight[:2], rtol=1e-6)
    np.testing.assert_allclose(resumed, straight[2:], rtol=1e-6)


def test_windowed_multistep_matches_per_step(tmp_path, rng, monkeypatch):
    """fused_window composes with steps_per_dispatch: the K-steps-per-dispatch
    scan over a rotating window follows the per-dispatch trajectory (same
    window per epoch, same absolute-step RNG folds; divergence is only the
    scan-body-vs-standalone-step XLA reassociation that Adam amplifies —
    measured growing 2e-7 → 3e-4 relative over 3 epochs, same envelope as
    test_multistep_matches_per_step_trajectory documents)."""
    monkeypatch.chdir(tmp_path)
    store = _lazy_store(tmp_path, rng, n=4, cache=2)

    def run(spd, ck):
        cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=3,
                     eval_every_epoch=100, plot_every_epoch=100,
                     attention_impl="xla", fused_pipeline="auto",
                     fused_window=2, steps_per_dispatch=spd)
        cfg.finalize()
        t = Trainer(cfg, channels=6)
        t.fit(store, ckpt_dir=str(tmp_path / ck))
        key = ("multistep", False) if spd > 1 else ("fused", False)
        assert key in t._steps
        return t.all_epoch_losses["total_loss"]

    np.testing.assert_allclose(run(1, "ck_s1"), run(2, "ck_s2"), rtol=1e-3)


class _FakeDevice:
    def __init__(self, stats):
        self._stats = stats

    def memory_stats(self):
        return self._stats


def test_auto_fused_window_resolution(tmp_path, rng):
    """fused_window='auto' sizes K from cube bytes vs device memory stats
    (VERDICT r3 #7): full-fit -> 0, partial-fit -> K (2x boundary charge),
    too-tight -> -1 (host-sampler degrade), no stats -> 0."""
    from sshslie_tpu.train import auto_fused_window

    store = _store(tmp_path, rng, shapes=((40, 48, 6),) * 6)
    cube = 40 * 48 * 6 * 4  # bytes per f32 cube

    def dev(free):
        return _FakeDevice({"bytes_limit": int(free / 0.5),
                            "bytes_in_use": 0})

    # Stack of 6 fits outright → no windowing.
    assert auto_fused_window(store, 2, device=dev(6 * cube)) == 0
    # Stack misses; 5 cube-charges / 2x boundary charge → K=2 window.
    assert auto_fused_window(store, 2, device=dev(5 * cube)) == 2
    # Budget only covers one window cube → smallest useful window (2) misses.
    assert auto_fused_window(store, 2, device=dev(2 * cube)) == -1
    # Backend without stats (CPU virtual devices) → resident default.
    assert auto_fused_window(store, 2, device=_FakeDevice(None)) == 0
    assert auto_fused_window(store, 2, device=_FakeDevice({})) == 0
    # Mixed shapes can't window at all.
    mixed = _store(tmp_path / "mx", rng,
                   shapes=((40, 48, 6), (32, 48, 6)))
    assert auto_fused_window(mixed, 2, device=dev(100 * cube)) == -1

    # Lazy (disk-backed) stores must NEVER resolve to 0: stack_cubes
    # returns None for them, so 'resident' would silently drop the fused
    # pipeline to the host sampler while the log claims residency.
    from sshslie_tpu.data.datasets import LazyCubeStore

    lazy = LazyCubeStore(str(tmp_path / "cubes"), normalization=None)
    # Full-fit budget → still a window (a strict subset of N=6).
    k = auto_fused_window(lazy, 2, device=dev(100 * cube))
    assert 2 <= k <= 5
    # No memory stats → sized from 2·batch_size instead of 'resident'.
    k = auto_fused_window(lazy, 2, device=_FakeDevice(None))
    assert 2 <= k <= 5
    # Partial fit windows as before.
    assert auto_fused_window(lazy, 2, device=dev(5 * cube)) == 2
    # Too small to hold a strict-subset window → host sampler.
    tiny_dir = tmp_path / "tiny"
    tiny_dir.mkdir()
    sio.savemat(tiny_dir / "c0.mat",
                {"data": rng.rand(40, 48, 6).astype(np.float32)})
    tiny = LazyCubeStore(str(tiny_dir), normalization=None)
    assert auto_fused_window(tiny, 2, device=dev(100 * cube)) == -1


def test_trainer_auto_window_on_lazy_store_engages_fused(tmp_path, rng,
                                                         monkeypatch):
    """Regression: lazy_loading + fused_window='auto' (the combination auto
    exists for) must engage the windowed fused pipeline, not silently fall
    back to the host sampler behind a 'fits resident' message."""
    from sshslie_tpu.data.datasets import LazyCubeStore

    store = _store(tmp_path, rng, shapes=((40, 48, 6),) * 4)
    lazy = LazyCubeStore(str(tmp_path / "cubes"), normalization=None)
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=2,
                 eval_every_epoch=100, plot_every_epoch=100, start_lr=1e-3,
                 use_mlflow=False, attention_impl="xla",
                 fused_window="auto")
    cfg.finalize()
    t = Trainer(cfg, channels=6)
    t.fit(lazy, ckpt_dir=str(tmp_path / "ck"))
    # The fused (windowed) step must have been built — no host sampler.
    assert any(k[0] in ("fused", "multistep") for k in t._steps), t._steps
    assert len(t.all_epoch_losses["total_loss"]) == 2


def test_fused_window_config_accepts_auto():
    from sshslie_tpu.config import load_config, parse_args

    cfg = load_config(None, {"fused_window": "auto"}, finalize=False)
    assert cfg.fused_window == "auto"
    cfg = load_config(None, {"fused_window": "3"}, finalize=False)
    assert cfg.fused_window == 3
    with pytest.raises(ValueError, match="fused_window"):
        load_config(None, {"fused_window": "sometimes"}, finalize=False)
    with pytest.raises(ValueError, match="fused_window"):
        load_config(None, {"fused_window": -2}, finalize=False)
    # CLI path: --fused_window auto must survive the int coercion layer.
    cfg = parse_args(["--config", os.devnull, "--fused_window", "auto",
                      "--model_name", "t"])
    assert cfg.fused_window == "auto"


def test_trainer_auto_window_resolves_and_trains(tmp_path, rng, monkeypatch):
    """End-to-end: fused_window='auto' through Trainer.fit — resolves to a
    window (stubbed stats), logs the resolution, and trains."""
    import sshslie_tpu.train as train_mod

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        d = tmp_path / "data"
        d.mkdir()
        for i in range(4):
            sio.savemat(d / f"c{i}.mat",
                        {"data": (rng.rand(32, 32, 5) * 3000 + 200
                                  ).astype(np.float32)})
        monkeypatch.setattr(
            train_mod, "auto_fused_window",
            lambda store, b, device=None: 2,
        )
        cfg = Config(channels=5, global_min=200.0, global_max=4095.0,
                     batch_size=2, patch_size=16, epoch=2, phase="train",
                     train_data=str(d), model_name="autow",
                     attention_impl="xla", fused_window="auto",
                     use_mlflow=False, jit_cache_dir="")
        cfg.finalize()
        from sshslie_tpu.data.datasets import CubeStore

        store = CubeStore(str(d), normalization="global_normalization",
                          global_min=200.0, global_max=4095.0)
        trainer = Trainer(cfg, channels=5)
        trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
        assert len(trainer.all_epoch_losses["total_loss"]) == 2
    finally:
        os.chdir(cwd)


def test_auto_window_not_resolved_when_pipeline_off(tmp_path, rng,
                                                    monkeypatch):
    """fused_window='auto' with fused_pipeline='off' must NOT query device
    memory or print a resolution the host sampler will never act on
    (review r4)."""
    import sshslie_tpu.train as train_mod

    def _boom(*a, **k):
        raise AssertionError("auto_fused_window resolved on an ineligible "
                             "pipeline")

    monkeypatch.setattr(train_mod, "auto_fused_window", _boom)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        d = tmp_path / "data"
        d.mkdir()
        for i in range(3):
            sio.savemat(d / f"c{i}.mat",
                        {"data": (rng.rand(32, 32, 5) * 3000 + 200
                                  ).astype(np.float32)})
        cfg = Config(channels=5, global_min=200.0, global_max=4095.0,
                     batch_size=2, patch_size=16, epoch=1, phase="train",
                     train_data=str(d), model_name="autoff",
                     attention_impl="xla", fused_window="auto",
                     fused_pipeline="off", use_mlflow=False,
                     jit_cache_dir="")
        cfg.finalize()
        from sshslie_tpu.data.datasets import CubeStore

        store = CubeStore(str(d), normalization="global_normalization",
                          global_min=200.0, global_max=4095.0)
        trainer = Trainer(cfg, channels=5)
        trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
        assert len(trainer.all_epoch_losses["total_loss"]) == 1
    finally:
        os.chdir(cwd)


def test_fused_step_remat_matches_baseline(tmp_path, rng):
    """`remat: true` must compose with the fused on-device sampler: same
    parameter tree and a trajectory equal to the non-remat fused step up to
    fusion-rounding (remat recomputes the same ops — the sampled patch
    stream and update math must be untouched)."""
    store = _store(tmp_path, rng)
    cubes = stack_cubes(store)
    tx = make_optimizer()
    key = jax.random.PRNGKey(3)

    def run(remat):
        cfg = Config(channels=6, patch_size=16, batch_size=2,
                     attention_impl="xla", remat=remat)
        model = build_model(cfg, 6)
        assert model.remat is remat
        params = init_params(model, 0, 16)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_fused_train_step(model, tx, loss_coeffs(cfg),
                                     batch_size=2, patch_size=16)
        traj = []
        for i in range(5):
            state, terms = step(state, cubes, jax.random.fold_in(key, i),
                                jnp.int32(0), jnp.float32(1e-3))
            traj.append(float(terms["total_loss"]))
        return traj, state

    t0, s0 = run(False)
    t1, s1 = run(True)
    np.testing.assert_allclose(t0, t1, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-6)
