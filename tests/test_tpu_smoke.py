"""Opt-in real-TPU smoke: the Pallas paths lowered through Mosaic, not the
interpreter (VERDICT r3 weak #6 — a Mosaic-lowering regression must fail a
test, not a benchmark session).

Run:
    SSHSLIE_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

The conftest skips every other file and leaves the backend alone so the
axon TPU plugin wins; off-TPU this file self-skips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU smoke (set SSHSLIE_TPU_SMOKE=1 on a TPU host)",
)


def test_flash_attention_mosaic():
    from sshslie_tpu.ops.attention import flash_attention, sdpa_xla

    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, 512, 32)), jnp.float32)
        for _ in range(3)
    )
    # Reference at highest matmul precision: the default TPU f32 path runs
    # bf16 MXU passes (~1e-3 error of its own), which would swamp a real
    # lowering bug. The flash kernel accumulates in f32; bf16-class atol
    # still catches any softmax/rescale/masking regression (those are O(1)).
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(sdpa_xla)(q, k, v)
    got = jax.jit(flash_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-2)


def test_pallas_conv_mosaic_fwd_and_vjp():
    from sshslie_tpu.ops.conv_pallas import pallas_shallow_conv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 32, 128, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((9, 9, 64, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)

    def xla(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((4, 4), (4, 4)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b

    ref = jax.jit(xla)(x, w, b)
    got = jax.jit(lambda x, w, b: pallas_shallow_conv(x, w, b, False))(x, w, b)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4 * scale, rtol=1e-4)

    def loss(conv):
        return jax.jit(jax.grad(
            lambda x, w, b: jnp.sum(jnp.sin(conv(x, w, b))),
            argnums=(0, 1, 2),
        ))

    gr = loss(xla)(x, w, b)
    gp = loss(lambda x, w, b: pallas_shallow_conv(x, w, b, False))(x, w, b)
    for name, a, c in zip("dx dw db".split(), gr, gp):
        s = float(jnp.abs(a).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), atol=5e-4 * s, rtol=1e-3,
            err_msg=f"{name} mismatch",
        )


def test_fused_step_with_pallas_paths():
    """One fused train step with attention_impl=pallas + conv_impl=pallas on
    the real backend: compiles, runs, loss finite and equal to the XLA-impl
    step on the same state/batch to bf16-free f32 tolerance."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.train import (
        TrainState, build_model, init_params, loss_coeffs,
        make_fused_train_step, make_optimizer,
    )

    rng = np.random.default_rng(11)
    cubes = jnp.asarray(rng.random((2, 160, 160, 64)) * 0.2, jnp.float32)

    losses = {}
    for impl in ("xla", "pallas"):
        cfg = Config(channels=64, patch_size=128, batch_size=2,
                     attention_impl="xla", conv_impl=impl)
        cfg.finalize()
        model = build_model(cfg, cfg.channels)
        params = init_params(model, cfg.seed_value, cfg.patch_size)
        tx = make_optimizer()
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_fused_train_step(model, tx, loss_coeffs(cfg),
                                     cfg.batch_size, cfg.patch_size)
        state, terms = step(state, cubes, jax.random.PRNGKey(0),
                            jnp.int32(0), jnp.float32(1e-4))
        total = float(terms["total_loss"])
        assert np.isfinite(total)
        losses[impl] = total
    np.testing.assert_allclose(losses["pallas"], losses["xla"],
                               rtol=5e-4, atol=5e-5)


def test_remat_step_on_tpu():
    """The rematerialized step lowered for the real backend: compiles, runs,
    loss finite and equal to the non-remat step on the same state/batch
    (remat recomputes the same ops — jit-rounding tolerance only)."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.train import (
        TrainState, build_model, init_params, loss_coeffs, make_optimizer,
        make_train_step,
    )

    rng = np.random.default_rng(5)
    batch = jnp.asarray(rng.random((2, 128, 128, 64)) * 0.2, jnp.float32)
    losses = {}
    for remat in (False, True):
        cfg = Config(channels=64, patch_size=128, batch_size=2,
                     attention_impl="xla", remat=remat)
        cfg.finalize()
        model = build_model(cfg, cfg.channels)
        params = init_params(model, cfg.seed_value, cfg.patch_size)
        tx = make_optimizer()
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx, loss_coeffs(cfg))
        state, terms = step(state, batch, jnp.float32(1e-4))
        total = float(terms["total_loss"])
        assert np.isfinite(total)
        losses[remat] = total
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=5e-4, atol=5e-5)
