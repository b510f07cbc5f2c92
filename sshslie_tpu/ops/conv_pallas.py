"""Hand-written Pallas TPU kernels for the shallow 9×9 convolution.

Why this exists (VERDICT r3 → round 4): the per-instruction conv anatomy
(docs/PERFORMANCE.md, scripts/conv_anatomy.py) pinned the step's largest
remaining inefficiency to the DecompositionNet shallow conv (reference
model.py:22 — ``nn.Conv2d(channel, kernel_size*3)`` i.e. 9×9, 64→64):
XLA's conv emitter runs its fwd at ~70% of the MXU-column roofline, dgrad
at ~50% and wgrad at ~43%, and round 3 proved every mathematically
equivalent *conv-form* reformulation converges back to the same emitter.
These kernels are the one reformulation class that bypasses the emitter.

Design (per /opt/skills/guides/pallas_guide.md; v2 after the first cut
failed Mosaic lowering on 64-lane slices):

  * **Width-paired channels fill the MXU contraction dim.** A 64-channel
    conv tap is a (M, 64)·(64, 64) matmul — half the 128-row systolic
    array idles, and a 64-wide lane dim violates Mosaic's 128-lane tiling
    for HBM→VMEM DMA slices. Both problems die together: the input is
    pre-paired in XLA as ``xpair[..., w, 0:64] = xp[..., w, :]`` and
    ``xpair[..., w, 64:128] = xp[..., w+1, :]``, so the operand for the
    tap pair (kh, kw), (kh, kw+1) is ONE contiguous (TH, TW, 128) window
    slice, and every lane dim in the kernel is exactly 128. The k×k taps
    become k·⌈k/2⌉ paired passes (45 for k=9; the phantom column k pairs
    with zero weights), each a full (M, 128)·(128, 64) matmul.
  * **Halo'd input tiles via manual DMA.** xpair is spatially pre-padded
    by (k−1)/2 (a fused XLA pad), parked in HBM/ANY, and each grid step
    DMAs its (TH+k−1, TW+k−1, 128) window into VMEM — BlockSpec
    partitions cannot overlap, DMA windows can. Only *spatial* dims are
    ever sliced (HBM and VMEM both); the lane dim stays whole.
  * **Packed weights stay VMEM-resident** ((45, 128, 64) bf16 ≈ 0.7 MB)
    across the whole grid (constant index_map).
  * **f32 accumulation** in VMEM scratch; one cast on the way out.
  * **One kernel, two passes.** For stride-1 SAME odd-k convs, dgrad is
    the same conv with a spatially-reversed, in/out-transposed kernel
    (proved exact in round 3's reformulation B), so the forward kernel
    serves both. wgrad gets its own kernel: every paired (128, 64) dW
    block accumulates in a VMEM-resident output across the sequential
    grid, so activations stream through VMEM exactly once.

Scope: stride 1, SAME padding, odd k, C_in = C_out = 64 (the measured-weak
case; the reference's other convs already run at 80-96% of roofline), H
divisible by a tile height, W divisible by 128. Anything else falls back
to ``lax.conv_general_dilated`` — selection happens in
``models/layers.py::Conv2d`` behind the ``conv_impl`` config knob.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The MXU geometry these kernels are shaped around.
_LANES = 128
_CI = 64
_CO = 64
_TW = 128  # output tile width (lane-dim of the matmul M ordering)


def conv9_supported(shape: Tuple[int, ...], k: int, ci: int, co: int,
                    stride: int = 1) -> bool:
    """Can the Pallas path take this conv? (else: XLA emitter fallback)."""
    if stride != 1 or k % 2 == 0 or k < 3:
        return False
    if ci != _CI or co != _CO:
        return False
    if len(shape) != 4:
        return False
    _, h, w, _ = shape
    # _tile_h always finds a divisor of h (worst case 1), so any h >= 2
    # tiles; width must fill whole 128-lane output tiles.
    return h >= 2 and w > 0 and w % _TW == 0


def _tile_h(h: int) -> int:
    """Largest tile height ≤ 32 dividing H (grid steps stay few, VMEM small)."""
    for th in (32, 16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def _n_pairs(k: int) -> int:
    return k * ((k + 1) // 2)


def _pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(k, k, 64, 64) → (k·⌈k/2⌉, 128, 64) matching the width-paired input.

    Pair (kh, kwp) holds taps (kh, 2·kwp) and (kh, 2·kwp+1) stacked on the
    input-channel axis; for odd k the phantom column kw = k is zero so the
    paired window's second half contributes nothing."""
    k = w.shape[0]
    # Pad the kw axis to k+1 (even) with a zero column, then group in twos.
    wp = jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))
    half = (k + 1) // 2
    # (k, k+1, CI, CO) → (k, half, 2, CI, CO) → (k·half, 2·CI, CO)
    return wp.reshape(k, half, 2, _CI, _CO).reshape(
        k * half, 2 * _CI, _CO
    )


def _pair_input(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, 64) → (B, H+k−1, W+k−1, 128) padded + width-paired."""
    pad = (k - 1) // 2
    # One extra right column so the phantom partner kw = k exists (its
    # weights are zero, so the value is irrelevant — zeros keep it tidy).
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad + 1), (0, 0)))
    return jnp.concatenate([xp[:, :, :-1, :], xp[:, :, 1:, :]], axis=-1)


def _fwd_kernel(k: int, th: int, xp_ref, wp_ref, out_ref, x_t, sem):
    """One (TH, TW, 64) output tile: DMA the halo'd width-paired window,
    then k·⌈k/2⌉ full-contraction matmuls accumulating in f32.

    The accumulator is an SSA value, not a VMEM ref: letting Mosaic schedule
    it (instead of forcing a read-modify-write of a (M, 64) scratch per
    matmul) measured 1.38× on the fwd pass (78.8 vs 57.0 TF/s, b8 bf16 —
    docs/conv_anatomy_r4.json)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * th, th + k - 1), pl.ds(j * _TW, _TW + k - 1), :],
        x_t,
        sem,
    )
    dma.start()
    dma.wait()
    m = th * _TW
    half = (k + 1) // 2
    acc = jnp.zeros((m, _CO), jnp.float32)
    for kh in range(k):
        for kwp in range(half):
            acc = acc + jnp.dot(
                x_t[kh:kh + th, 2 * kwp:2 * kwp + _TW, :].reshape(m, 2 * _CI),
                wp_ref[kh * half + kwp],
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc.reshape(th, _TW, _CO).astype(out_ref.dtype)


def conv9_fwd(x: jnp.ndarray, w: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME k×k conv, NHWC × HWIO → NHWC, 64→64 channels."""
    bsz, h, wdt, ci = x.shape
    k = w.shape[0]
    assert conv9_supported(x.shape, k, ci, w.shape[-1])
    th = _tile_h(h)
    xpair = _pair_input(x, k)
    wp = _pack_weights(w.astype(x.dtype))
    grid = (bsz, h // th, wdt // _TW)
    kernel = functools.partial(_fwd_kernel, k, th)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, _CO), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # paired input, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights, resident
        ],
        out_specs=pl.BlockSpec(
            (1, th, _TW, _CO), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + k - 1, _TW + k - 1, 2 * _CI), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xpair, wp)


def _wgrad_kernel(k: int, th: int, xp_ref, dy_ref, dw_ref, x_t, sem):
    """Accumulate all paired-tap dW partials for one activation tile.

    dW[kh,kw,ci,co] = Σ_{b,h,w} Xp[b,h+kh,w+kw,ci]·dY[b,h,w,co]: per pair a
    (M,128)ᵀ·(M,64) contraction with M = the whole tile — the width-paired
    window stacks taps (kh,kw) and (kh,kw+1) on the LHS so each pass emits
    a (128, 64) dW block. The output lives in VMEM for the entire
    sequential grid (constant index_map) and is zeroed on the first step."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    first = (b == 0) & (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * th, th + k - 1), pl.ds(j * _TW, _TW + k - 1), :],
        x_t,
        sem,
    )
    dma.start()
    dma.wait()
    m = th * _TW
    half = (k + 1) // 2
    dyf = dy_ref[0].reshape(m, _CO)
    for kh in range(k):
        for kwp in range(half):
            dw_ref[kh * half + kwp] += jax.lax.dot_general(
                x_t[kh:kh + th, 2 * kwp:2 * kwp + _TW, :].reshape(m, 2 * _CI),
                dyf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def conv9_wgrad(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of the stride-1 SAME k×k 64→64 conv → (k,k,64,64) f32."""
    bsz, h, wdt, ci = x.shape
    assert conv9_supported(x.shape, k, ci, dy.shape[-1])
    th = _tile_h(h)
    xpair = _pair_input(x, k)
    half = (k + 1) // 2
    n_pairs = k * half
    grid = (bsz, h // th, wdt // _TW)
    kernel = functools.partial(_wgrad_kernel, k, th)
    dw_packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pairs, 2 * _CI, _CO), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, th, _TW, _CO), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_pairs, 2 * _CI, _CO), lambda b, i, j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + k - 1, _TW + k - 1, 2 * _CI), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xpair, dy)
    # Unpack (k·half, 128, 64) → (k, k, 64, 64): pair (kh, kwp) rows 0:64
    # are tap (kh, 2·kwp), rows 64:128 tap (kh, 2·kwp+1); drop the phantom
    # column kw = k.
    dw = dw_packed.reshape(k, half, 2, _CI, _CO).reshape(k, k + 1, _CI, _CO)
    return dw[:, :k]


def _dgrad_weights(w: jnp.ndarray) -> jnp.ndarray:
    """The kernel that makes dX a plain forward conv: spatial reverse +
    in/out transpose (exact for odd k, stride 1 — round-3 reformulation B)."""
    return jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_shallow_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Bias-included shallow conv with Pallas fwd/dgrad/wgrad kernels."""
    return conv9_fwd(x, w, interpret=interpret) + b.astype(x.dtype)


def _psc_fwd(x, w, b, interpret):
    return pallas_shallow_conv(x, w, b, interpret), (x, w)


def _psc_bwd(interpret, res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = conv9_fwd(g, _dgrad_weights(w).astype(x.dtype), interpret=interpret)
    # wgrad stays on the XLA emitter: its native wgrad measured 81.9 TF/s vs
    # the Pallas kernel's 77.9 (b8 bf16, docs/conv_anatomy_r4.json) — the
    # emitter's weak passes are fwd/dgrad, not wgrad. conv9_wgrad remains
    # in-tree as the measured negative result.
    k = w.shape[0]
    pad = (k - 1) // 2
    _, dw_vjp = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x, w_, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w)
    dw = dw_vjp(g)[0]
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx.astype(x.dtype), dw, db


pallas_shallow_conv.defvjp(_psc_fwd, _psc_bwd)


def _xla_conv(x, w):
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_dgrad_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Shallow conv whose ONLY Pallas pass is dgrad (the emitter's weakest:
    48.0 vs 71.4 TF/s measured, docs/conv_anatomy_r4.json); fwd and wgrad
    stay on the emitter. One custom-call per step bounds the layout damage
    a Pallas boundary inflicts on the surrounding graph (see
    docs/PERFORMANCE.md round-4 section)."""
    return _xla_conv(x, w) + b.astype(x.dtype)


def _pdc_fwd(x, w, b, interpret):
    return pallas_dgrad_conv(x, w, b, interpret), (x, w)


def _pdc_bwd(interpret, res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = conv9_fwd(g, _dgrad_weights(w).astype(x.dtype), interpret=interpret)
    _, dw_vjp = jax.vjp(lambda w_: _xla_conv(x, w_), w)
    dw = dw_vjp(g)[0]
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx.astype(x.dtype), dw, db


pallas_dgrad_conv.defvjp(_pdc_fwd, _pdc_bwd)


def shallow_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 impl: str = "xla",
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """Impl-dispatching shallow conv: Pallas when asked for and supported,
    the XLA emitter otherwise. All impls compute the same stride-1 SAME
    conv; 'pallas' routes all passes through the Mosaic kernels,
    'pallas_dgrad' only the input gradient."""
    k = w.shape[0]
    if impl in ("pallas", "pallas_dgrad") and conv9_supported(
            x.shape, k, x.shape[-1], w.shape[-1]):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if impl == "pallas_dgrad":
            return pallas_dgrad_conv(x, w, b, interpret)
        return pallas_shallow_conv(x, w, b, interpret)
    return _xla_conv(x, w) + b.astype(x.dtype)
