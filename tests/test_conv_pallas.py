"""Pallas shallow-conv kernels (ops/conv_pallas.py) vs the XLA emitter.

Interpret-mode on CPU; shapes kept tiny because the interpreter emulates
every grid step in Python. The non-interpreted Mosaic lowering is covered
by the opt-in real-backend smoke (tests/test_tpu_smoke.py).

Target: the DecompositionNet shallow conv (reference model.py:22 —
kernel_size*3 = 9×9, 64→64); k=3 exercises the same code path 8× faster.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sshslie_tpu.ops.conv_pallas import (
    conv9_fwd,
    conv9_supported,
    conv9_wgrad,
    pallas_shallow_conv,
    shallow_conv,
)


def _xla_conv(x, w, b):
    k = w.shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _inputs(rng, bsz=1, h=8, w=128, c=64, k=3):
    x = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, c, c)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return x, wt, b


@pytest.fixture
def nprng():
    return np.random.default_rng(7)


class TestSupported:
    def test_the_shallow_conv_shape(self):
        assert conv9_supported((8, 512, 512, 64), 9, 64, 64)

    def test_rejections(self):
        assert not conv9_supported((1, 8, 128, 64), 9, 64, 64, stride=2)
        assert not conv9_supported((1, 8, 128, 64), 4, 64, 64)   # even k
        assert not conv9_supported((1, 8, 128, 32), 9, 32, 64)   # ci != 64
        assert not conv9_supported((1, 8, 128, 64), 9, 64, 128)  # co != 64
        assert not conv9_supported((1, 8, 100, 64), 9, 64, 64)   # W % 128
        assert not conv9_supported((8, 128, 64), 9, 64, 64)      # rank 3


class TestInterpretCorrectness:
    def test_fwd_k3(self, nprng):
        x, w, b = _inputs(nprng)
        ref = _xla_conv(x, w, b)
        got = pallas_shallow_conv(x, w, b, True)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_fwd_k9_multi_tile(self, nprng):
        # Two batch entries × two width tiles so the DMA halo indexing is
        # exercised off the origin.
        x, w, b = _inputs(nprng, bsz=2, h=4, w=256, k=9)
        ref = _xla_conv(x, w, b)
        got = pallas_shallow_conv(x, w, b, True)
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    def test_vjp_k3(self, nprng):
        x, w, b = _inputs(nprng)

        def loss(conv):
            def f(x, w, b):
                return jnp.sum(jnp.sin(conv(x, w, b)))
            return f

        gr = jax.grad(loss(_xla_conv), argnums=(0, 1, 2))(x, w, b)
        gp = jax.grad(
            loss(lambda x, w, b: pallas_shallow_conv(x, w, b, True)),
            argnums=(0, 1, 2),
        )(x, w, b)
        for name, a, c in zip("dx dw db".split(), gr, gp):
            scale = float(jnp.abs(a).max()) or 1.0
            np.testing.assert_allclose(
                c, a, atol=5e-4 * scale, rtol=1e-3,
                err_msg=f"{name} mismatch",
            )

    def test_wgrad_kernel_direct(self, nprng):
        # conv9_wgrad against the transpose-conv identity, over a grid with
        # batch > 1 so the VMEM accumulator carries across sequential steps.
        x, w, b = _inputs(nprng, bsz=2, h=4, w=128, k=3)
        dy = jnp.asarray(nprng.standard_normal(x.shape), jnp.float32)
        ref = jax.grad(
            lambda w: jnp.vdot(_xla_conv(x, w, b), dy)
        )(w)
        got = conv9_wgrad(x, dy, 3, interpret=True)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(got, ref, atol=5e-4 * scale, rtol=1e-3)

    def test_bf16_io_f32_accumulate(self, nprng):
        x, w, b = _inputs(nprng)
        got = conv9_fwd(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        interpret=True)
        assert got.dtype == jnp.bfloat16
        ref = _xla_conv(x, w, jnp.zeros_like(b))
        np.testing.assert_allclose(
            got.astype(jnp.float32), ref, atol=0.15, rtol=0.05
        )


class TestPallasDgradVariant:
    def test_fwd_is_emitter_and_vjp_matches(self, nprng):
        from sshslie_tpu.ops.conv_pallas import pallas_dgrad_conv

        x, w, b = _inputs(nprng)

        def loss(conv):
            return lambda x, w, b: jnp.sum(jnp.sin(conv(x, w, b)))

        ref_y = _xla_conv(x, w, b)
        got_y = pallas_dgrad_conv(x, w, b, True)
        np.testing.assert_allclose(got_y, ref_y, atol=1e-6)
        gr = jax.grad(loss(_xla_conv), argnums=(0, 1, 2))(x, w, b)
        gp = jax.grad(
            loss(lambda x, w, b: pallas_dgrad_conv(x, w, b, True)),
            argnums=(0, 1, 2),
        )(x, w, b)
        for name, a, c in zip("dx dw db".split(), gr, gp):
            scale = float(jnp.abs(a).max()) or 1.0
            np.testing.assert_allclose(
                c, a, atol=5e-4 * scale, rtol=1e-3,
                err_msg=f"{name} mismatch",
            )


class TestDispatch:
    def test_unsupported_shape_falls_back_to_xla(self, nprng):
        x, w, b = _inputs(nprng, w=100)  # W % 128 != 0
        ref = _xla_conv(x, w, b)
        got = shallow_conv(x, w, b, impl="pallas")
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_xla_impl_is_emitter(self, nprng):
        x, w, b = _inputs(nprng)
        ref = _xla_conv(x, w, b)
        got = shallow_conv(x, w, b, impl="xla")
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_layer_wiring(self, nprng):
        # Conv2d(impl='pallas') must agree with impl='xla' on transplanted
        # params — the integration point models/layers.py:69-77.
        from sshslie_tpu.models.layers import Conv2d

        x = jnp.asarray(nprng.standard_normal((1, 4, 128, 64)), jnp.float32)
        mod_x = Conv2d(features=64, kernel_size=3, impl="xla")
        mod_p = Conv2d(features=64, kernel_size=3, impl="pallas")
        params = mod_x.init(jax.random.PRNGKey(0), x)
        ref = mod_x.apply(params, x)
        got = mod_p.apply(params, x)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_config_threads_conv_impl(self):
        from sshslie_tpu.config import Config
        from sshslie_tpu.train import build_model

        model = build_model(Config(conv_impl="pallas"), channels=64)
        assert model.conv_impl == "pallas"
        model_default = build_model(Config(), channels=64)
        assert model_default.conv_impl == "xla"
