"""Training engine: jitted train step, freeze/unfreeze, epoch orchestration.

Replaces reference model.py:236-341 with a TPU-native loop:

  * one ``jax.jit``-compiled step = forward (+ second decomposition) + all six
    loss terms + grads + Adam update, donated buffers;
  * loss terms accumulate *on device*; the host syncs once per epoch (the
    reference calls ``.item()`` seven times per batch, model.py:567-574);
  * the decomposition-net freeze is a static variant of the step (two compiled
    graphs) with the reference's optimizer-recreation-at-unfreeze semantics
    (model.py:273-288): the whole optimizer state is re-initialized at the
    unfreeze epoch;
  * data-parallel over a ``Mesh``: batches arrive sharded on the batch axis,
    params replicated; XLA inserts the ICI all-reduce for the grad means.

Optimizer parity: torch.optim.Adam defaults (β=(0.9, 0.999), eps=1e-8, no
weight decay, bias-corrected moments) — optax.scale_by_adam matches exactly.
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from sshslie_tpu import checkpoints
from sshslie_tpu.config import Config
from sshslie_tpu.data.datasets import CubeStore, Prefetcher
from sshslie_tpu.models.enhance import LowLightEnhanceNet
from sshslie_tpu.ops.losses import total_loss
from sshslie_tpu.parallel.mesh import batch_sharding, replicated_sharding
from sshslie_tpu.utils.schedule import step_lr

LOSS_KEYS = (
    "total_loss",
    "L_reconstruction",
    "L_R_fidelity",
    "L_I_smooth_low",
    "L_I_smooth_delta",
    "L_fourier",
    "L_spectral_cons",
)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


class _SnapshotView:
    """Read-only trainer facade over a host-side params snapshot.

    Passed to the evaluator when ``async_eval`` is on, so evaluation sees the
    params as of the eval epoch while the live state keeps training (and keeps
    getting donated — the snapshot must be off-device before the next step).
    """

    def __init__(self, trainer: "Trainer", params_host: Any):
        self.cfg = trainer.cfg
        self.model = trainer.model
        self.mesh = trainer.mesh  # evaluate._make_inferencer dispatches on it

        class _S:
            params = params_host

        self.state = _S()


def loss_coeffs(cfg: Config) -> Dict[str, float]:
    return {
        "c_loss_reconstruction": float(cfg.c_loss_reconstruction),
        "c_loss_r_fidelity": float(cfg.c_loss_r_fidelity),
        "c_loss_i_smooth_low": float(cfg.c_loss_i_smooth_low),
        "c_loss_i_smooth_delta": float(cfg.c_loss_i_smooth_delta),
        "c_loss_fourier": float(cfg.c_loss_fourier),
        "c_loss_spectral_cons": float(cfg.c_loss_spectral_cons),
        "alpha_i_smooth_low": float(cfg.alpha_i_smooth_low),
        "alpha_i_smooth_delta": float(cfg.alpha_i_smooth_delta),
    }


def build_model(cfg: Config, channels: int) -> LowLightEnhanceNet:
    dtype = jnp.bfloat16 if cfg.precision == "bfloat16" else jnp.float32
    return LowLightEnhanceNet(
        input_channels=channels,
        use_attention=cfg.use_attention,
        use_transformer=cfg.use_transformer,
        attention_impl=cfg.attention_impl,
        # 'auto' resolves to the XLA emitter: the Pallas kernels win
        # per-op (dgrad 1.49x) but lose at graph level to custom-call layout
        # propagation — on the train step (r4) AND on inference-only graphs
        # (r5 A/B: 0.90x full forward, docs/PERFORMANCE.md). The knobs stay
        # as measured negatives pending Mosaic layout support.
        conv_impl=cfg.conv_impl if cfg.conv_impl in (
            "pallas", "pallas_dgrad") else "xla",
        remat=cfg.remat,
        dtype=dtype,
    )


def init_params(model: LowLightEnhanceNet, seed: int, patch_size: int) -> Any:
    dummy = jnp.zeros((1, patch_size, patch_size, model.input_channels), jnp.float32)
    variables = jax.jit(model.init, static_argnums=())(jax.random.PRNGKey(seed), dummy)
    return variables["params"]


def make_optimizer() -> optax.GradientTransformation:
    """Adam core; the LR is applied inside the step so epoch-wise StepLR
    changes (utils/schedule.py) don't trigger recompilation."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def _zero_decom_grads(grads: Any) -> Any:
    """Zero the DecompositionNet subtree (freeze; reference model.py:274-279).

    Preserves the container type: a FrozenDict in must come back frozen, or
    optax's tree_map over (grads, opt_state) hits a pytree-structure
    mismatch on the first frozen step under flax_return_frozendict."""
    if isinstance(grads, FrozenDict):
        return grads.copy(
            {"decomposition_net": jax.tree.map(
                jnp.zeros_like, grads["decomposition_net"]
            )}
        )
    grads = dict(grads)
    grads["decomposition_net"] = jax.tree.map(
        jnp.zeros_like, grads["decomposition_net"]
    )
    return grads



def _make_loss_fn(model: LowLightEnhanceNet, coeffs: Dict[str, float]):
    """The shared training objective: forward + re-decomposition + six-term
    loss (reference model.py:544-575). ONE definition for all four step
    builders — the bit-identical-trajectory contract between them must be
    structural, not maintained by parallel edits."""

    def loss_fn(params, batch):
        R_low, I_low, I_delta, S, R_enh = model.apply(
            {"params": params}, batch,
            method=LowLightEnhanceNet.forward_with_redecomposition,
        )
        return total_loss(batch, R_low, I_low, I_delta, S, R_enh, coeffs)

    return loss_fn


def _apply_update(tx, state: TrainState, grads, lr, freeze_decom: bool):
    """Freeze-mask + Adam + descent (shared by every step builder)."""
    if freeze_decom:
        grads = _zero_decom_grads(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    # Descend: params ← params − lr · adam_update
    params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1)


def _sample_fused_batch(cubes, key, batch_start, batch_size: int,
                        patch_size: int, mesh, data_axis: str,
                        space_axis: str):
    """On-device crop + augmentation draw for the fused pipelines.

    Reference sampling semantics (model.py:300-310): cyclic cube indexing by
    global sample position, crop offsets in [0, dim − patch) exclusive, one
    of 8 augmentation modes. ONE definition shared by the per-step fused and
    multistep builders — their trajectories must agree by construction.
    """
    from sshslie_tpu.utils.augment import augment_batch_jax

    n, h, w, c = cubes.shape
    kx, ky, km = jax.random.split(key, 3)
    idx = (batch_start + jnp.arange(batch_size)) % n
    xs = jax.random.randint(kx, (batch_size,), 0, h - patch_size)
    ys = jax.random.randint(ky, (batch_size,), 0, w - patch_size)
    modes = jax.random.randint(km, (batch_size,), 0, 8)

    def crop(i, xi, yi):
        return jax.lax.dynamic_slice(
            cubes, (i, xi, yi, 0), (1, patch_size, patch_size, c)
        )[0]

    patches = jax.vmap(crop)(idx, xs, ys)
    batch = augment_batch_jax(patches, modes)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = (
            P(data_axis, space_axis, None, None)
            if space_axis
            else P(data_axis, None, None, None)
        )
        batch = jax.lax.with_sharding_constraint(
            batch, NamedSharding(mesh, spec)
        )
    return batch


def make_train_step(
    model: LowLightEnhanceNet,
    tx: optax.GradientTransformation,
    coeffs: Dict[str, float],
    freeze_decom: bool = False,
    mesh=None,
    data_axis: str = "data",
    space_axis: str = "",
):
    """Build the jitted train step: (state, batch, lr) → (state, terms).

    ``freeze_decom`` is static — train runs compile at most two variants.
    With a mesh, the batch argument is expected sharded on ``data_axis`` and
    the state replicated; the returned state keeps its sharding. With a 2-D
    mesh and ``space_axis``, the patch height is sharded too (dp×sp — XLA
    inserts conv halo exchanges and attention gathers), keeping all chips
    busy at the reference's batch sizes of 1-2.
    """

    loss_fn = _make_loss_fn(model, coeffs)

    def step_fn(state: TrainState, batch: jnp.ndarray, lr: jnp.ndarray):
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return _apply_update(tx, state, grads, lr, freeze_decom), terms

    donate = (0,)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate)
    replicated = replicated_sharding(mesh)
    if space_axis:
        from sshslie_tpu.parallel.mesh import batch_space_sharding

        batched = batch_space_sharding(mesh, data_axis, space_axis)
    else:
        batched = batch_sharding(mesh, data_axis)
    return jax.jit(
        step_fn,
        donate_argnums=donate,
        in_shardings=(replicated, batched, replicated),
        out_shardings=(replicated, replicated),
    )


def make_accum_train_step(
    model: LowLightEnhanceNet,
    tx: optax.GradientTransformation,
    coeffs: Dict[str, float],
    accum_steps: int,
    freeze_decom: bool = False,
    mesh=None,
    data_axis: str = "data",
    space_axis: str = "",
):
    """Gradient-accumulation step: (state, batch, lr) → (state, terms).

    The (B, P, P, C) batch is split into ``accum_steps`` microbatches that
    run sequentially under ``lax.scan`` — peak activation memory drops by
    ~accum_steps× while the update stays EXACTLY the full-batch update
    (modulo float reassociation): every loss term is a mean over batch
    elements, so the mean of microbatch gradients equals the full-batch
    gradient. Net-new over the reference (no counterpart to cite); enables
    large patch×band workloads (e.g. 224-band 256² patches) on one chip.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    loss_fn = _make_loss_fn(model, coeffs)

    def step_fn(state: TrainState, batch: jnp.ndarray, lr: jnp.ndarray):
        b = batch.shape[0]
        if b % accum_steps != 0:
            raise ValueError(
                f"batch {b} not divisible by grad_accum_steps {accum_steps}"
            )
        micro = batch.reshape(accum_steps, b // accum_steps, *batch.shape[1:])

        def body(carry, mb):
            g_sum, t_sum = carry
            (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb
            )
            return (
                jax.tree.map(jnp.add, g_sum, grads),
                jax.tree.map(jnp.add, t_sum, terms),
            ), None

        zeros_g = jax.tree.map(jnp.zeros_like, state.params)
        zeros_t = {k: jnp.zeros((), jnp.float32) for k in LOSS_KEYS}
        (g_sum, t_sum), _ = jax.lax.scan(body, (zeros_g, zeros_t), micro)
        inv = jnp.float32(1.0 / accum_steps)
        grads = jax.tree.map(lambda g: g * inv, g_sum)
        terms = jax.tree.map(lambda t: t * inv, t_sum)
        return _apply_update(tx, state, grads, lr, freeze_decom), terms

    donate = (0,)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate)
    replicated = replicated_sharding(mesh)
    if space_axis:
        from sshslie_tpu.parallel.mesh import batch_space_sharding

        batched = batch_space_sharding(mesh, data_axis, space_axis)
    else:
        batched = batch_sharding(mesh, data_axis)
    return jax.jit(
        step_fn,
        donate_argnums=donate,
        in_shardings=(replicated, batched, replicated),
        out_shardings=(replicated, replicated),
    )


def make_fused_train_step(
    model: LowLightEnhanceNet,
    tx: optax.GradientTransformation,
    coeffs: Dict[str, float],
    batch_size: int,
    patch_size: int,
    freeze_decom: bool = False,
    mesh=None,
    data_axis: str = "data",
    space_axis: str = "",
):
    """Fully-fused step: on-device patch sampling + augmentation + forward +
    loss + Adam in ONE jitted graph — zero host→device transfer per step.

    The cube stack (N, H, W, C) lives in HBM; each step draws crop offsets and
    augmentation modes from a jax PRNG key, gathers (B, P, P, C) patches with
    ``dynamic_slice``, applies the 8-mode augmentation via ``lax.switch``, and
    runs the training update. This removes the host sampler from the critical
    path entirely (the reference crops in numpy inside the step loop,
    model.py:300-312). Requires all cubes to share one shape — true for the
    JYU/indoor datasets; the Trainer falls back to the host pipeline
    otherwise.

    Reference sampling semantics preserved: cyclic cube indexing by global
    sample position (model.py:304) and crop offsets in [0, dim − patch)
    exclusive (model.py:306-307). The RNG stream itself is jax's
    threefry rather than numpy's MT (documented deviation).
    """
    loss_fn = _make_loss_fn(model, coeffs)

    def step_fn(state: TrainState, cubes: jnp.ndarray, key: jnp.ndarray,
                batch_start: jnp.ndarray, lr: jnp.ndarray):
        batch = _sample_fused_batch(cubes, key, batch_start, batch_size,
                                    patch_size, mesh, data_axis, space_axis)
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return _apply_update(tx, state, grads, lr, freeze_decom), terms

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    replicated = replicated_sharding(mesh)
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(replicated, replicated, replicated, replicated, replicated),
        out_shardings=(replicated, replicated),
    )


def make_multistep_train_step(
    model: LowLightEnhanceNet,
    tx: optax.GradientTransformation,
    coeffs: Dict[str, float],
    batch_size: int,
    patch_size: int,
    freeze_decom: bool = False,
    mesh=None,
    data_axis: str = "data",
    space_axis: str = "",
):
    """K fused train steps per dispatch via ``lax.scan``.

    The b2 reference workload is dispatch-latency-bound on TPU (see
    docs/PERFORMANCE.md): at ~12 ms/step a large fraction is host dispatch
    through the relay, not device compute. Scanning K steps inside ONE jitted
    graph amortizes that to 1/K per step. Sampling semantics are bit-identical
    to :func:`make_fused_train_step`: the caller passes the same absolute
    ``step_ids`` (epoch·num_batches + batch_id, for the RNG fold) and
    ``batch_starts`` (batch_id·batch_size, for cyclic cube indexing) that the
    per-step path would use, so toggling ``steps_per_dispatch`` does not
    change the training trajectory.

    Signature: (state, cubes, base_key, step_ids[K], batch_starts[K],
    valid[K], lr) → (state, terms summed over the valid steps).

    ``valid`` masks padding: a remainder chunk shorter than K is padded to
    length K with valid=False entries whose state updates and loss terms are
    discarded — one scan length, one XLA compile, regardless of how the epoch
    divides.
    """
    loss_fn = _make_loss_fn(model, coeffs)

    def one_step(state: TrainState, cubes, base_key, step_id, batch_start, lr):
        key = jax.random.fold_in(base_key, step_id)
        batch = _sample_fused_batch(cubes, key, batch_start, batch_size,
                                    patch_size, mesh, data_axis, space_axis)
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return _apply_update(tx, state, grads, lr, freeze_decom), terms

    def step_fn(state: TrainState, cubes, base_key, step_ids, batch_starts,
                valid, lr):
        def body(carry, xs):
            step_id, batch_start, ok = xs
            new_state, terms = one_step(
                carry, cubes, base_key, step_id, batch_start, lr
            )
            # Padding steps are full no-ops: discard the update and zero the
            # terms (Adam moments must not decay on a padding step).
            new_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_state, carry
            )
            terms = jax.tree.map(lambda t: jnp.where(ok, t, 0.0), terms)
            return new_state, terms

        state, terms_stacked = jax.lax.scan(
            body, state, (step_ids, batch_starts, valid)
        )
        return state, jax.tree.map(lambda t: jnp.sum(t, axis=0), terms_stacked)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    replicated = replicated_sharding(mesh)
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(replicated,) * 7,
        out_shardings=(replicated, replicated),
    )


def stack_cubes(store: CubeStore) -> Optional[jnp.ndarray]:
    """Device-resident (N, H, W, C) stack when all cubes share one shape.

    Disk-backed stores (LazyCubeStore) return None — the fused pipeline needs
    the whole dataset resident, which is exactly what a lazy store avoids;
    use ``fused_window`` (WindowedCubeFeeder) to keep the fused sampler for
    datasets too large to stack."""
    from sshslie_tpu.data.datasets import LazyCubeStore

    if isinstance(store, LazyCubeStore):
        return None
    shapes = {c.shape for c in store.cubes}
    if len(shapes) != 1:
        return None
    return jnp.asarray(np.stack(store.cubes))


def auto_fused_window(store: CubeStore, batch_size: int, device=None,
                      safety: float = 0.5) -> int:
    """Resolve ``fused_window: auto`` → a concrete window size (VERDICT r3 #7).

    Returns ``0`` when the full stack fits device memory outright (no
    windowing — the resident fused pipeline), a ``K`` in ``[max(2, batch),
    N-1]`` when a rotating window fits where the stack doesn't, or ``-1``
    when even the smallest useful window blows the budget (the caller warns
    and degrades to the host sampler).

    The budget charges each window cube 2× — peak HBM briefly holds two
    windows at the epoch boundary (docs/CONFIG.md) — against ``safety`` of
    the device's free memory (``memory_stats``). Backends without memory
    stats (CPU virtual devices, some relays) resolve to 0: host RAM is the
    real constraint there and the pre-auto default (full stack) stands.

    Disk-backed stores (``lazy_loading: true``) never resolve to 0:
    ``stack_cubes`` returns None for them, so "resident" would silently
    drop the fused pipeline to the host sampler — exactly the combination
    auto exists for. They window even when the full stack would fit, and
    size from ``2·batch_size`` when the backend has no memory stats.

    Note: auto re-resolves per process from *current* memory stats, so a
    resumed run can pick a different K than the original (K changes which
    cube each sample reads). Runs that need bit-exact resume replay should
    pin an explicit integer ``fused_window``.
    """
    from sshslie_tpu.data.datasets import LazyCubeStore

    if device is None:
        device = jax.local_devices()[0]
    shapes = {tuple(s) for s in store.shapes}
    if len(shapes) != 1:
        return -1  # windowing needs one shape; host sampler handles mixed
    h, w, c = next(iter(shapes))
    cube_bytes = h * w * c * 4  # stacks are float32 (normalized cubes)
    n = len(store)
    lazy = isinstance(store, LazyCubeStore)
    k_min = max(2, min(batch_size, n))
    if lazy and n <= k_min:
        return -1  # a window must be a strict subset; host sampler instead
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if not stats or "bytes_limit" not in stats:
        if lazy:
            return int(min(max(k_min, 2 * batch_size), n - 1))
        return 0
    free = int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    budget = int(free * safety)
    if n * cube_bytes <= budget and not lazy:
        return 0  # resident stack fits (single copy, uploaded once)
    k = budget // (2 * cube_bytes)
    if k < k_min:
        return -1
    return int(min(k, n - 1))


def report_hbm_pressure(device=None, threshold: float = 0.92):
    """One-line device-memory pressure report, printed once after the first
    trained epoch.

    XLA:TPU fits HBM-oversubscribed programs at compile time by silently
    trading step time for memory (measured: the no-remat b8 p380 step runs
    at 16.95 GiB naive temp on a 15.75 GiB chip — docs/PERFORMANCE.md r4
    remat scale sweep). A peak near the ceiling is the observable symptom,
    so surface it: the user can shrink batch/patch or set ``remat: true``
    for co-residency headroom instead of wondering why steps got slower.
    Returns the printed line, or None when the backend exposes no memory
    stats (CPU virtual devices, some relays) or on non-zero processes.
    """
    if jax.process_index() != 0:
        return None
    if device is None:
        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if not stats or "bytes_limit" not in stats:
        return None
    limit = int(stats["bytes_limit"])
    peak = int(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)))
    if limit <= 0 or peak <= 0:
        return None
    gib = 1024.0 ** 3
    line = (f"HBM pressure: peak {peak / gib:.2f}/{limit / gib:.2f} GiB "
            f"({100.0 * peak / limit:.1f}%)")
    if peak >= threshold * limit:
        line += (" — near the ceiling: XLA may be trading step time for "
                 "memory; consider a smaller batch/patch or remat: true")
    print(line)
    return line


class WindowedCubeFeeder:
    """Rotating device-resident window for the fused pipeline over datasets
    too large to stack in HBM (VERDICT r2 weak #5; net-new vs the reference,
    whose loader is bounded by host RAM, model.py:241-251).

    Stream semantics (documented contract, tests/test_fused_pipeline.py):

      * epoch ``e`` trains on window ``W_e = [(e·K + j) mod N for j < K]`` —
        the window advances K cubes per epoch, so every cube is revisited
        with period ``ceil(N/K)`` epochs;
      * within an epoch the fused step's cyclic cube indexing
        ``(batch_start + i) mod n`` runs over the K-cube window (n = K)
        instead of the full store (n = N);
      * the crop/augmentation RNG stream is UNCHANGED from the full-resident
        fused path — keys still fold on the absolute step id — so windowing
        changes only which cube each sample reads, and resume replays
        exactly (the window is a pure function of the epoch index).

    The next epoch's window is assembled on a background thread (disk loads
    through the store's LRU overlap the current epoch's device compute);
    ``window()`` then pays only the host→device transfer. Peak HBM holds two
    windows briefly at the epoch boundary — size K accordingly.
    """

    def __init__(self, store: CubeStore, k: int, place, num_epochs=None):
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self.store = store
        self.n = len(store)
        self.k = min(int(k), self.n)
        self._place = place
        self.num_epochs = num_epochs  # known → no dead prefetch past the end
        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="fused-window"
        )
        self._cancel = threading.Event()
        self._next = None  # (epoch, Future[np.ndarray])

    def indices(self, epoch: int) -> list:
        start = (epoch * self.k) % self.n
        return [(start + j) % self.n for j in range(self.k)]

    def _host_window(self, epoch: int) -> np.ndarray:
        # Load cube-by-cube, checking the cancel flag between disk loads:
        # the pool's worker is non-daemon (joined at interpreter exit), so a
        # close() mid-prefetch must be able to bail after the *current* cube
        # instead of stalling process exit for the remaining K-1 loads with
        # the partial stack pinned in RAM (advisor r3).
        cubes = []
        for i in self.indices(epoch):
            if self._cancel.is_set():
                raise RuntimeError("WindowedCubeFeeder closed mid-prefetch")
            cubes.append(self.store[i])
        return np.stack(cubes)

    def window(self, epoch: int) -> jnp.ndarray:
        if self._next is not None and self._next[0] == epoch:
            host = self._next[1].result()
        else:  # first epoch, or a resume jumped the sequence
            host = self._host_window(epoch)
        if self.num_epochs is None or epoch + 1 < self.num_epochs:
            self._next = (
                epoch + 1, self._pool.submit(self._host_window, epoch + 1)
            )
        else:
            # Final epoch: prefetching K more cubes from disk would be dead
            # work that pins a full window stack in RAM until close().
            self._next = None
        return self._place(host)

    def close(self) -> None:
        self._cancel.set()
        self._pool.shutdown(wait=False, cancel_futures=True)


class Trainer:
    """Epoch orchestration (reference train_model, model.py:236-341)."""

    def __init__(
        self,
        cfg: Config,
        channels: int,
        mesh=None,
        mlflow=None,
        observer=None,
    ):
        self.cfg = cfg
        self.channels = channels
        self.mesh = mesh
        self.mlflow = mlflow
        self.observer = observer  # observability.RunObserver or None
        self.model = build_model(cfg, channels)
        self.tx = make_optimizer()
        self.coeffs = loss_coeffs(cfg)
        params = init_params(self.model, cfg.seed_value, cfg.patch_size)
        self.state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            rep = replicated_sharding(mesh)
            self.state = jax.device_put(self.state, rep)
        self.freeze_decom_epochs = int(cfg.freeze_decom_epochs or 0)
        self._steps: Dict[bool, Any] = {}
        self.all_epoch_losses: Dict[str, list] = {k: [] for k in LOSS_KEYS}
        self.eval_metrics: Dict[int, Dict[str, float]] = {}

    # -- pretrained / warm start (reference main.py:196-212) --
    def load_pretrained(self, path: str) -> None:
        params, epoch = checkpoints.load_pretrained_params(path, self.state.params)
        self.state = self.state.replace(params=params)
        if self.mesh is not None:
            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        print(f"Loaded model from epoch {epoch if epoch is not None else 'unknown'}")
        print("Pretrained model loaded successfully!")

    def _step_for(self, freeze: bool):
        if freeze not in self._steps:
            self._steps[freeze] = make_train_step(
                self.model, self.tx, self.coeffs,
                freeze_decom=freeze, mesh=self.mesh, data_axis=self.cfg.data_axis,
                space_axis=self.cfg.space_axis,
            )
        return self._steps[freeze]

    def _accum_step_for(self, freeze: bool):
        key = ("accum", freeze)
        if key not in self._steps:
            self._steps[key] = make_accum_train_step(
                self.model, self.tx, self.coeffs,
                accum_steps=self.cfg.grad_accum_steps,
                freeze_decom=freeze, mesh=self.mesh, data_axis=self.cfg.data_axis,
                space_axis=self.cfg.space_axis,
            )
        return self._steps[key]

    def _fused_step_for(self, freeze: bool):
        key = ("fused", freeze)
        if key not in self._steps:
            self._steps[key] = make_fused_train_step(
                self.model, self.tx, self.coeffs,
                batch_size=self.cfg.batch_size, patch_size=self.cfg.patch_size,
                freeze_decom=freeze, mesh=self.mesh, data_axis=self.cfg.data_axis,
                space_axis=self.cfg.space_axis,
            )
        return self._steps[key]

    def _multistep_for(self, freeze: bool):
        key = ("multistep", freeze)
        if key not in self._steps:
            self._steps[key] = make_multistep_train_step(
                self.model, self.tx, self.coeffs,
                batch_size=self.cfg.batch_size, patch_size=self.cfg.patch_size,
                freeze_decom=freeze, mesh=self.mesh, data_axis=self.cfg.data_axis,
                space_axis=self.cfg.space_axis,
            )
        return self._steps[key]

    def _lr_for_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        unfreeze = self.freeze_decom_epochs if self.freeze_decom_epochs > 0 else 0
        return step_lr(
            epoch, cfg.start_lr, cfg.lr_update_factor, cfg.lr_update_period, unfreeze
        )

    def fit(
        self,
        train_store: CubeStore,
        eval_store: Optional[CubeStore] = None,
        evaluator=None,
        ckpt_dir: Optional[str] = None,
        eval_result_dir: Optional[str] = None,
        label_dir: Optional[str] = None,
    ) -> None:
        cfg = self.cfg
        # Fail at fit start with an actionable message, not steps later with a
        # gather-out-of-range (patch) or a flax shape error (channels). The
        # reference crashes the same two ways (model.py:306-307 crop; conv0).
        shapes = getattr(train_store, "shapes", None) or [
            c.shape for c in train_store.cubes
        ]
        if shapes:
            min_h = min(s[0] for s in shapes)
            min_w = min(s[1] for s in shapes)
            if cfg.patch_size > min_h or cfg.patch_size > min_w:
                raise ValueError(
                    f"patch_size {cfg.patch_size} exceeds the smallest "
                    f"training cube ({min_h}x{min_w}); reduce patch_size"
                )
            # Every cube, not just the first: with the python sampler a later
            # mixed-channel cube would otherwise fail mid-training with an
            # opaque broadcast error (the native sampler already validates
            # uniformity across all cubes).
            for i, s in enumerate(shapes):
                if s[2] != self.channels:
                    raise ValueError(
                        f"model was built for {self.channels} channels but "
                        f"{train_store.files[i]} has {s[2]} (check the "
                        f"'channels' config key and dataset uniformity)"
                    )
        if len(train_store) // cfg.batch_size == 0:
            # PARITY #23: the reference's num_batches = N // batch_size
            # (model.py:253) silently becomes 0 when batch_size exceeds the
            # dataset — every epoch runs zero steps, prints loss 0.0, and
            # checkpoints untrained weights.
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds the {len(train_store)} "
                "training cube(s): zero steps per epoch (the epoch drops the "
                "remainder batch, PARITY #7) — reduce batch_size"
            )
        ckpt_dir = ckpt_dir or os.path.join(
            cfg.model_ckpt_dir, "Decomposition_" + cfg.timestamp
        )
        os.makedirs(ckpt_dir, exist_ok=True)

        # Crash/stop recovery: pick up the rolling latest checkpoint and
        # continue from its epoch. The fused pipeline's RNG folds on the
        # absolute step id, so a resumed run replays the exact trajectory the
        # uninterrupted run would have taken.
        start_epoch = 0
        if cfg.resume:
            latest = checkpoints.latest_path(ckpt_dir)
            if os.path.exists(latest):
                params, opt_state, start_epoch = checkpoints.load_checkpoint(
                    latest, self.state.params, self.state.opt_state
                )
                steps_done = start_epoch * (len(train_store) // cfg.batch_size)
                self.state = TrainState(
                    params=params, opt_state=opt_state,
                    step=jnp.asarray(steps_done, jnp.int32),
                )
                if self.mesh is not None:
                    self.state = jax.device_put(
                        self.state, replicated_sharding(self.mesh)
                    )
                print(f"Resuming training from epoch {start_epoch}")
            else:
                print(f"resume requested but no checkpoint at {latest}; "
                      "starting fresh")
        if eval_result_dir:
            os.makedirs(eval_result_dir, exist_ok=True)

        # Pipeline selection: fully-fused on-device sampling when every cube
        # shares one shape (fused_pipeline 'auto'/'on') — full-resident stack,
        # or a rotating K-cube device window (``fused_window``) for datasets
        # too large to stack — else the host-side native/Python sampler with
        # threaded prefetch.
        def _place_fused(arr):
            """Device placement for a fused cube stack/window."""
            if self.mesh is not None:
                if jax.process_count() > 1:
                    # Every host holds the (identical) host array; the
                    # replicated spec makes it a global array without DCN
                    # traffic beyond coordination.
                    return jax.make_array_from_process_local_data(
                        replicated_sharding(self.mesh), np.asarray(arr)
                    )
                return jax.device_put(
                    jnp.asarray(arr), replicated_sharding(self.mesh)
                )
            return jnp.asarray(arr)

        fused_cubes = None
        fused_feeder = None
        if cfg.grad_accum_steps > 1 and cfg.fused_pipeline == "on":
            raise ValueError(
                "grad_accum_steps > 1 requires the host pipeline; set "
                "fused_pipeline to 'auto' or 'off'"
            )
        fused_window = cfg.fused_window
        fused_eligible = (cfg.grad_accum_steps <= 1
                          and cfg.fused_pipeline in ("auto", "on"))
        if fused_window == "auto" and not fused_eligible:
            # Don't resolve (a device memory_stats round-trip) or print a
            # resolution the host-sampler path will never act on.
            fused_window = 0
        if fused_window == "auto":
            dev = (self.mesh.devices.flat[0] if self.mesh is not None
                   else None)
            fused_window = auto_fused_window(
                train_store, cfg.batch_size, device=dev
            )
            if fused_window < 0:
                print("fused_window=auto: no useful window fits the device "
                      "memory budget (or cube shapes are mixed) — degrading "
                      "to the host sampler")
            elif fused_window == 0:
                print("fused_window=auto: full training stack fits resident "
                      "(no windowing)")
            else:
                print(f"fused_window=auto: window={fused_window}/"
                      f"{len(train_store)} cube(s) from device memory stats "
                      "(pin an integer fused_window for bit-exact resume "
                      "across memory-state changes)")
        if fused_eligible and fused_window >= 0:
            uniform = len({tuple(s) for s in shapes}) == 1
            if fused_window > 0 and uniform and fused_window < len(
                train_store
            ):
                fused_feeder = WindowedCubeFeeder(
                    train_store, fused_window, _place_fused,
                    num_epochs=cfg.epoch,
                )
            else:
                fused_cubes = stack_cubes(train_store)
                if (fused_cubes is None and fused_window > 0 and uniform):
                    # fused_window ≥ N on a lazy store: the user asked for
                    # device residency and the window covers everything —
                    # materialize the full stack once.
                    fused_cubes = np.stack(
                        [train_store[i] for i in range(len(train_store))]
                    )
                if fused_cubes is None and cfg.fused_pipeline == "on":
                    raise ValueError(
                        "fused_pipeline='on' requires all training cubes to "
                        "share one shape (or fused_window for lazy stores); "
                        "use 'auto' or 'off' for mixed-size datasets"
                    )
                if fused_cubes is not None:
                    fused_cubes = _place_fused(fused_cubes)
        sampler = None
        if fused_cubes is None and fused_feeder is None:
            from sshslie_tpu.data.native_sampler import make_sampler

            sampler = make_sampler(
                train_store, cfg.batch_size, cfg.patch_size,
                seed=cfg.seed_value, mode=cfg.sampler,
            )
            if start_epoch > 0:
                # Replay-exact resume for the host pipelines too: draw epoch
                # k's patches, not a restart of epoch 0's (PARITY #19's
                # same-config+seed ⇒ same-trajectory promise).
                sampler.skip_epochs(start_epoch)
            # The three pipelines draw from different RNG streams (PARITY
            # #19); log the resolved choice so a run is reproducible from
            # its console log alone.
            print(f"Patch sampler: {type(sampler).__name__} "
                  f"(sampler={cfg.sampler!r}, rng="
                  f"{'xoshiro256**' if type(sampler).__name__ == 'NativePatchSampler' else 'numpy PCG64'})")
        elif fused_feeder is not None:
            print(f"Patch sampler: fused on-device pipeline, windowed "
                  f"(window={fused_feeder.k}/{fused_feeder.n} cubes, "
                  f"fused_pipeline={cfg.fused_pipeline!r}, rng=threefry)")
        else:
            print(f"Patch sampler: fused on-device pipeline "
                  f"(fused_pipeline={cfg.fused_pipeline!r}, rng=threefry)")
        num_batches = len(train_store) // cfg.batch_size
        base_key = jax.random.PRNGKey(cfg.seed_value)
        sharding = None
        if self.mesh is not None:
            from sshslie_tpu.parallel.mesh import shard_batch_size

            # Fail at fit start with the intended message — otherwise the
            # first non-divisible batch dies steps later with a low-level
            # GSPMD/device_put error inside the prefetch thread.
            shard_batch_size(cfg.batch_size, self.mesh, cfg.data_axis)
            if cfg.space_axis:
                from sshslie_tpu.parallel.mesh import batch_space_sharding

                n_sp = self.mesh.shape[cfg.space_axis]
                if cfg.patch_size % n_sp != 0:
                    raise ValueError(
                        f"patch_size {cfg.patch_size} not divisible by the "
                        f"'{cfg.space_axis}' mesh axis ({n_sp} shards)"
                    )
                sharding = batch_space_sharding(
                    self.mesh, cfg.data_axis, cfg.space_axis
                )
            else:
                sharding = batch_sharding(self.mesh, cfg.data_axis)
        if self.mlflow:
            self.mlflow.log_params(
                {
                    "epochs": cfg.epoch,
                    "start_lr": cfg.start_lr,
                    "adaptive_lr": abs(cfg.lr_update_factor - 1) > 1e-6,
                    "batch_size": cfg.batch_size,
                    "optimizer": "Adam",
                }
            )
        if self.observer:
            self.observer.log_model_summary(self.state.params, ckpt_dir, self.mlflow)

        eval_pool = None
        pending_evals: list = []
        if cfg.async_eval:
            from concurrent.futures import ThreadPoolExecutor

            # One worker: evals are serialized among themselves but overlap
            # the training epochs (roadmap: the train loop never stalls on
            # eval-side .mat saves and metric computation).
            eval_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="async-eval"
            )

        # Cross-epoch eval artifact saver (sync-eval path only): an eval
        # epoch's device→host output fetches and .mat writes overlap the
        # SUBSEQUENT training epochs instead of draining before the eval
        # returns (VERDICT r4 #1). The async-eval path already overlaps whole
        # evals, and its worker owns a per-call saver — sharing one across
        # threads would race submit/drain.
        eval_saver = None
        if evaluator is not None and not cfg.async_eval:
            from sshslie_tpu.evaluate import _OverlappedSaver

            eval_saver = _OverlappedSaver()
            self.eval_saver = eval_saver

        # Background checkpoint writer: serialization + fsync + latest-copy +
        # prune overlap the next epoch; the (small) device fetch stays
        # synchronous because the next step donates the live state buffers.
        ckpt_writer = None
        if cfg.checkpoint_async and jax.process_index() == 0:
            ckpt_writer = checkpoints.AsyncWriter()

        # Best-eval-PSNR tracking (checkpoint_best): state is per fit run —
        # a resume starts fresh, so an existing model_epoch_best from the
        # interrupted run can be replaced by a lower-PSNR "best"; the epoch
        # checkpoints remain the durable record.
        best = {"psnr": float("-inf"), "ep": None, "written_ep": None}

        def _record_eval(ep: int, scores) -> None:
            if scores is not None:
                self.eval_metrics[ep] = scores
                if (cfg.checkpoint_best and "psnr" in scores
                        and scores["psnr"] > best["psnr"]):
                    best["psnr"] = scores["psnr"]
                    best["ep"] = ep
                if self.observer and eval_result_dir:
                    self.observer.plot_eval_metrics(
                        self.eval_metrics,
                        os.path.join(eval_result_dir, "eval_metrics.png"),
                    )

        def _sync_best() -> None:
            """Copy the winning epoch checkpoint to model_epoch_best.

            Deferred from _record_eval because in the synchronous path the
            eval for epoch N runs BEFORE model_epoch_N.ckpt is written (and
            async evals complete whole epochs later) — so the copy happens
            at the next checkpoint-save / drain point, when the source file
            exists. Process 0 only (single-writer, like every other
            checkpoint write).

            The (epoch, psnr) candidate is snapshotted HERE, on the training
            thread, where the call site guarantees that epoch's save is
            already enqueued; the queued copy must not re-read the live
            ``best`` dict — a later eval recorded before the writer gets to
            the task would make it chase an epoch whose file isn't written
            yet."""
            if (not cfg.checkpoint_best or jax.process_index() != 0
                    or best["ep"] is None or best["ep"] == best["written_ep"]):
                return
            ep, psnr = best["ep"], best["psnr"]

            def _copy() -> None:
                src = checkpoints.epoch_path(ckpt_dir, ep)
                if not os.path.exists(src):
                    # A lagging async eval can outlive its epoch file under
                    # an aggressive checkpoint_keep. Reset the tracked best
                    # to the last epoch actually ON DISK (ADVICE r4):
                    # tracking the pruned maximum would let later epochs
                    # that beat the on-disk best — but not the pruned one —
                    # go uncopied, so model_epoch_best would stay stale
                    # forever. Guarded so a newer candidate recorded while
                    # this task sat in the queue isn't clobbered.
                    prev = best["written_ep"]
                    print(f"checkpoint_best: epoch {ep} checkpoint was "
                          f"already pruned; best left at epoch {prev}")
                    if best["ep"] == ep:
                        best["ep"] = prev
                        best["psnr"] = (
                            self.eval_metrics.get(prev, {}).get(
                                "psnr", float("-inf"))
                            if prev is not None else float("-inf")
                        )
                    return
                checkpoints.copy_checkpoint(src, checkpoints.best_path(ckpt_dir))
                best["written_ep"] = ep
                print(f"Best checkpoint updated: epoch {ep} "
                      f"(PSNR {psnr:.4f})")

            if ckpt_writer is not None:
                # FIFO behind the epoch save: the copy sees the file the
                # save task just wrote.
                ckpt_writer.submit(_copy)
            else:
                _copy()

        def _save_epoch_ckpt(ep: int, label: str = "Checkpoint") -> None:
            """Epoch file + latest byte-copy + retention prune (process 0).

            Single-writer: every process holds identical replicated state,
            but concurrent writes to a shared checkpoint dir would tear the
            .tmp files and race prune's os.remove. latest = byte-copy of the
            epoch file: skips the second device fetch + msgpack serialize
            (the fetch crosses the d2h link; the copy is pure host I/O with
            the same atomic-rename crash guarantees).

            With ``checkpoint_async`` the params/opt_state are fetched to
            host NOW (the next step donates the live device buffers) and the
            serialize + fsync + copy + prune run on the writer thread,
            overlapped with the next epoch's compute."""
            if jax.process_index() != 0:
                return

            def _write(params, opt_state):
                saved = checkpoints.save_checkpoint(
                    checkpoints.epoch_path(ckpt_dir, ep), params, opt_state, ep,
                )
                latest = checkpoints.copy_checkpoint(
                    saved, checkpoints.latest_path(ckpt_dir)
                )
                print(f"{label} saved at {latest}")
                if cfg.checkpoint_keep > 0:
                    checkpoints.prune_checkpoints(ckpt_dir, cfg.checkpoint_keep)

            if ckpt_writer is None:
                _write(self.state.params, self.state.opt_state)
            else:
                ckpt_writer.submit(
                    _write,
                    jax.device_get(self.state.params),
                    jax.device_get(self.state.opt_state),
                )

        def _drain_evals(block: bool) -> None:
            remaining = []
            for ep, fut in pending_evals:
                if block or fut.done():
                    try:
                        _record_eval(ep, fut.result())
                    except Exception as e:  # noqa: BLE001
                        # Graceful continuation: a failed eval is reported,
                        # never raised — it must not kill training nor mask a
                        # training exception when draining from the finally.
                        print(f"async eval for epoch {ep} failed: "
                              f"{type(e).__name__}: {e}")
                else:
                    remaining.append((ep, fut))
            pending_evals[:] = remaining

        # Preemption safety: on SIGTERM/SIGINT finish the current epoch,
        # write a resumable checkpoint, and return cleanly. TPU pods get
        # preempted; together with `resume: true` this makes training
        # restartable with at most one epoch of lost work. Installed only in
        # the main thread (signal API restriction); restored in the finally.
        import signal

        self._stop_requested = False
        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():
            def _request_stop(signum, _frame):
                if self._stop_requested:
                    # Second signal: restore original behavior and escalate —
                    # a user double-Ctrl-C must still force-stop mid-epoch.
                    for s, h in prev_handlers.items():
                        signal.signal(s, h)
                    raise KeyboardInterrupt
                self._stop_requested = True
                # os.write is async-signal-safe; print() is not (a signal
                # landing inside a buffered stdout write would raise a
                # reentrancy RuntimeError and kill the run uncheckpointed).
                os.write(2, f"\nsignal {signum}: will checkpoint and stop "
                            "after this epoch (repeat to force)\n".encode())

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _request_stop)

        try:
            profiling = False
            if cfg.profile_dir:
                # Trace the first epoch (post-compile steps land in the trace too;
                # TensorBoard-compatible output).
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True

            for epoch in range(start_epoch, cfg.epoch):
                freeze = self.freeze_decom_epochs > 0 and epoch < self.freeze_decom_epochs
                if self.freeze_decom_epochs > 0:
                    if epoch < self.freeze_decom_epochs:
                        print(f"Epoch {epoch+1}: DecompositionNet frozen")
                    elif epoch == self.freeze_decom_epochs:
                        # Reference recreates Adam at unfreeze (model.py:284-287):
                        # all moments/counters reset.
                        self.state = self.state.replace(
                            opt_state=self.tx.init(self.state.params)
                        )
                        if self.mesh is not None:
                            self.state = jax.device_put(
                                self.state, replicated_sharding(self.mesh)
                            )
                        print(f"Epoch {epoch+1}: DecompositionNet unfrozen")

                if fused_feeder is not None:
                    # Rebinding drops the previous window's device buffer;
                    # the next epoch's host stack was prefetched in the
                    # background during this epoch.
                    fused_cubes = fused_feeder.window(epoch)
                lr = self._lr_for_epoch(epoch)
                epoch_sums = None
                count = 0
                if fused_cubes is not None and cfg.steps_per_dispatch > 1:
                    # K steps per dispatch; same RNG fold + cube indexing as the
                    # per-step fused path, so the trajectory is identical.
                    step = self._multistep_for(freeze)
                    k = cfg.steps_per_dispatch
                    for chunk_start in range(0, num_batches, k):
                        ids = np.arange(chunk_start, min(chunk_start + k, num_batches))
                        n_real = len(ids)
                        # Pad remainder chunks to the fixed scan length K so the
                        # multistep graph compiles exactly once; padding entries
                        # are masked no-ops inside the scan.
                        pad = k - n_real
                        ids_padded = np.concatenate([ids, np.full(pad, ids[-1])]) if pad else ids
                        valid = jnp.asarray(
                            np.arange(k) < n_real if pad else np.ones(k, bool)
                        )
                        step_ids = jnp.asarray(
                            epoch * num_batches + ids_padded, jnp.uint32
                        )
                        batch_starts = jnp.asarray(ids_padded * cfg.batch_size, jnp.int32)
                        self.state, terms = step(
                            self.state, fused_cubes, base_key,
                            step_ids, batch_starts, valid, jnp.float32(lr),
                        )
                        epoch_sums = (
                            terms if epoch_sums is None
                            else jax.tree.map(jnp.add, epoch_sums, terms)
                        )
                        count += n_real
                        # Honor log_every_step's every-N-batches cadence: print
                        # when this chunk crossed an N boundary.
                        if cfg.log_every_step and (
                            (int(ids[-1]) + 1) // cfg.log_every_step
                            > int(ids[0]) // cfg.log_every_step
                        ):
                            print(
                                f"Epoch [{epoch+1}/{cfg.epoch}] "
                                f"Batch [{int(ids[-1])+1}/{num_batches}] "
                                f"Loss: {float(terms['total_loss']) / n_real:.6f}"
                            )
                elif fused_cubes is not None:
                    step = self._fused_step_for(freeze)
                    for batch_id in range(num_batches):
                        key = jax.random.fold_in(base_key, epoch * num_batches + batch_id)
                        self.state, terms = step(
                            self.state, fused_cubes, key,
                            jnp.int32(batch_id * cfg.batch_size), jnp.float32(lr),
                        )
                        epoch_sums = (
                            terms if epoch_sums is None
                            else jax.tree.map(jnp.add, epoch_sums, terms)
                        )
                        count += 1
                        if cfg.log_every_step and (batch_id + 1) % cfg.log_every_step == 0:
                            print(
                                f"Epoch [{epoch+1}/{cfg.epoch}] "
                                f"Batch [{batch_id+1}/{num_batches}] "
                                f"Loss: {float(terms['total_loss']):.6f}"
                            )
                else:
                    step = (self._accum_step_for(freeze)
                            if cfg.grad_accum_steps > 1 else self._step_for(freeze))
                    proc_slice = None
                    if self.mesh is not None and jax.process_count() > 1:
                        from sshslie_tpu.parallel.distributed import process_batch_slice

                        proc_slice = process_batch_slice(cfg.batch_size)
                    # Context manager: if step() raises, close() releases the
                    # put()-blocked worker instead of leaking it (and its
                    # device-resident staged batches) for the process life.
                    with Prefetcher(
                        sampler.epoch(), sharding=sharding, depth=cfg.prefetch_batches,
                        process_slice=proc_slice, mesh=self.mesh,
                        data_axis=cfg.data_axis, space_axis=cfg.space_axis,
                    ) as batches:
                        for batch_id, batch in enumerate(batches):
                            self.state, terms = step(self.state, batch, jnp.float32(lr))
                            epoch_sums = (
                                terms
                                if epoch_sums is None
                                else jax.tree.map(jnp.add, epoch_sums, terms)
                            )
                            count += 1
                            if cfg.log_every_step and (batch_id + 1) % cfg.log_every_step == 0:
                                print(
                                    f"Epoch [{epoch+1}/{cfg.epoch}] "
                                    f"Batch [{batch_id+1}/{num_batches}] "
                                    f"Loss: {float(terms['total_loss']):.6f}"
                                )

                # Single device→host sync per epoch.
                host_sums = (
                    {k: float(v) for k, v in jax.device_get(epoch_sums).items()}
                    if epoch_sums is not None
                    else {k: 0.0 for k in LOSS_KEYS}
                )
                avg = {k: (host_sums[k] / count if count else 0.0) for k in LOSS_KEYS}
                for k in LOSS_KEYS:
                    self.all_epoch_losses[k].append(avg[k])

                if epoch == start_epoch:
                    # Once, after the step has actually executed: peak HBM vs
                    # limit, with a warning when XLA is likely squeezing.
                    report_hbm_pressure(
                        self.mesh.devices.flat[0] if self.mesh is not None
                        else None
                    )

                if eval_result_dir and (epoch + 1) % cfg.plot_every_epoch == 0 and self.observer:
                    self.observer.plot_loss_curve(
                        self.all_epoch_losses,
                        os.path.join(eval_result_dir, "loss_curves.png"),
                    )

                if (epoch + 1) % cfg.eval_every_epoch == 0:
                    # Multi-host eval policy (docs/PARALLEL.md): with a plain
                    # (unsharded) evaluator every process would run the SAME
                    # full-cube inference and race on the SAME .mat writes —
                    # run it on process 0 only. With eval_sharded the forward
                    # is a mesh-wide collective, so every process must call it
                    # (the writer gating then lives inside evaluate_model) and
                    # it must run synchronously: an async eval thread would
                    # interleave its collectives with train-step collectives
                    # in a per-process nondeterministic order — a deadlock on
                    # a real pod.
                    multi = jax.process_count() > 1
                    eval_sharded = (self.mesh is not None
                                    and getattr(cfg, "eval_sharded", False))
                    run_eval = (not multi) or eval_sharded or jax.process_index() == 0
                    if (run_eval and evaluator is not None
                            and eval_store is not None and eval_result_dir):
                        # Sharded eval is collective — it must never run on
                        # the async worker thread, single-host included:
                        # two threads enqueueing multi-device programs can
                        # interleave per-device launches inconsistently.
                        if eval_pool is not None and not eval_sharded:
                            # Snapshot params to host *now* — the live buffers are
                            # donated to the next step and become invalid.
                            view = _SnapshotView(self, jax.device_get(self.state.params))
                            pending_evals.append((
                                epoch + 1,
                                eval_pool.submit(
                                    evaluator, view, eval_store, eval_result_dir,
                                    epoch + 1, label_dir,
                                ),
                            ))
                        else:
                            _record_eval(
                                epoch + 1,
                                evaluator(
                                    self, eval_store, eval_result_dir, epoch + 1, label_dir
                                ),
                            )
                    _save_epoch_ckpt(epoch + 1)
                    # After the epoch file lands: sync evals recorded their
                    # scores above, so the best copy can happen now.
                    _sync_best()

                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"Profiler trace written to {cfg.profile_dir}")

                if self.mlflow:
                    self.mlflow.log_metric("learning_rate", lr, step=epoch)
                    self.mlflow.log_metrics(avg, step=epoch)
                print(f"Epoch [{epoch+1}/{cfg.epoch}] Average Loss: {avg['total_loss']:.6f}")
                if eval_pool is not None:
                    _drain_evals(block=False)
                    _sync_best()

                if self._stop_requested:
                    if jax.process_index() == 0:
                        # Queued epoch saves also byte-copy into latest —
                        # drain first so the preemption write is the newest.
                        if ckpt_writer is not None:
                            ckpt_writer.drain()
                        checkpoints.save_checkpoint(
                            checkpoints.latest_path(ckpt_dir),
                            self.state.params, self.state.opt_state, epoch + 1,
                        )
                    print(f"Preemption checkpoint written at epoch {epoch+1}; "
                          "stopping (resume with resume: true)")
                    break

            # Final-tail checkpoint (PARITY #22): the reference saves ONLY on
            # the eval cadence (model.py:328-331), so a run whose epoch count
            # isn't a multiple of eval_every_epoch ends with its last epochs
            # unsaved — and train_and_test then dies at the test phase on a
            # missing model_epoch_latest. Completed training is never lost
            # here: write the final epoch's checkpoint when the cadence
            # didn't already cover it.
            if (not self._stop_requested and cfg.epoch > start_epoch
                    and cfg.epoch % cfg.eval_every_epoch != 0):
                _save_epoch_ckpt(cfg.epoch, label="Final checkpoint")

        finally:
            # Always restore the original signal handlers — a mid-train
            # exception must not leave the process uninterruptible.
            for sig, handler in prev_handlers.items():
                signal.signal(sig, handler)
            if fused_feeder is not None:
                fused_feeder.close()
            if profiling:
                # A raise during the traced first epoch must still flush the
                # trace (and free the profiler for a same-process retry).
                try:
                    jax.profiler.stop_trace()
                    print(f"Profiler trace written to {cfg.profile_dir}")
                except Exception as e:  # noqa: BLE001
                    print(f"profiler stop failed: {e}")
            # Drain async evals here (not after the try): if training raised,
            # pending futures would otherwise be dropped silently and the
            # non-daemon worker thread would delay process exit. An eval
            # failure is reported, never raised — it must not mask a training
            # exception, and a completed run must not die on a failed eval
            # (same graceful-continuation policy as the sync path).
            if eval_pool is not None:
                try:
                    _drain_evals(block=True)
                    _sync_best()
                finally:
                    eval_pool.shutdown(wait=True)
            # Close the background writers. `in_flight` decides the error
            # policy: a write failure must raise when training succeeded
            # (sync-path parity — a silently lost checkpoint is worse than a
            # failed run) but must only be REPORTED when it would otherwise
            # mask the in-flight training exception.
            in_flight = sys.exc_info()[0] is not None
            if ckpt_writer is not None:
                try:
                    ckpt_writer.close()
                except Exception as e:  # noqa: BLE001
                    if in_flight:
                        print(f"checkpoint write failed during teardown: "
                              f"{type(e).__name__}: {e}")
                    else:
                        raise
            if eval_saver is not None:
                self.eval_saver = None
                try:
                    eval_saver.close()
                except Exception as e:  # noqa: BLE001
                    if in_flight:
                        print(f"eval save failed during teardown: "
                              f"{type(e).__name__}: {e}")
                    else:
                        raise
            if self.observer is not None and hasattr(self.observer, "drain"):
                self.observer.drain()

        if self.mlflow:
            self.mlflow.log_param(
                "model_path", os.path.normpath(checkpoints.latest_path(ckpt_dir))
            )
