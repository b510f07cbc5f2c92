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

import functools
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from sshslie_tpu import checkpoints
from sshslie_tpu.config import Config
from sshslie_tpu.data.datasets import CubeStore, PatchSampler, Prefetcher
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
    """Zero the DecompositionNet subtree (freeze; reference model.py:274-279)."""
    if isinstance(grads, FrozenDict):
        grads = grads.unfreeze()
    grads = dict(grads)
    grads["decomposition_net"] = jax.tree.map(
        jnp.zeros_like, grads["decomposition_net"]
    )
    return grads


def make_train_step(
    model: LowLightEnhanceNet,
    tx: optax.GradientTransformation,
    coeffs: Dict[str, float],
    freeze_decom: bool = False,
    mesh=None,
    data_axis: str = "data",
):
    """Build the jitted train step: (state, batch, lr) → (state, terms).

    ``freeze_decom`` is static — train runs compile at most two variants.
    With a mesh, the batch argument is expected sharded on ``data_axis`` and
    the state replicated; the returned state keeps its sharding.
    """

    def loss_fn(params, batch):
        R_low, I_low, I_delta, S, R_enh = model.apply(
            {"params": params}, batch, method=LowLightEnhanceNet.forward_with_redecomposition
        )
        return total_loss(batch, R_low, I_low, I_delta, S, R_enh, coeffs)

    def step_fn(state: TrainState, batch: jnp.ndarray, lr: jnp.ndarray):
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        if freeze_decom:
            grads = _zero_decom_grads(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # Descend: params ← params − lr · adam_update
        params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), terms

    donate = (0,)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate)
    replicated = replicated_sharding(mesh)
    batched = batch_sharding(mesh, data_axis)
    return jax.jit(
        step_fn,
        donate_argnums=donate,
        in_shardings=(replicated, batched, replicated),
        out_shardings=(replicated, replicated),
    )


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
            )
        return self._steps[freeze]

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
        ckpt_dir = ckpt_dir or os.path.join(
            cfg.model_ckpt_dir, "Decomposition_" + cfg.timestamp
        )
        os.makedirs(ckpt_dir, exist_ok=True)
        if eval_result_dir:
            os.makedirs(eval_result_dir, exist_ok=True)

        from sshslie_tpu.data.native_sampler import make_sampler

        sampler = make_sampler(
            train_store, cfg.batch_size, cfg.patch_size, seed=cfg.seed_value
        )
        num_batches = sampler.num_batches
        sharding = (
            batch_sharding(self.mesh, cfg.data_axis) if self.mesh is not None else None
        )
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

        profiling = False
        if cfg.profile_dir:
            # Trace the first epoch (post-compile steps land in the trace too;
            # TensorBoard-compatible output).
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True

        for epoch in range(cfg.epoch):
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

            lr = self._lr_for_epoch(epoch)
            step = self._step_for(freeze)
            epoch_sums = None
            count = 0
            batches = Prefetcher(
                sampler.epoch(), sharding=sharding, depth=cfg.prefetch_batches
            )
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

            if eval_result_dir and (epoch + 1) % cfg.plot_every_epoch == 0 and self.observer:
                self.observer.plot_loss_curve(
                    self.all_epoch_losses,
                    os.path.join(eval_result_dir, "loss_curves.png"),
                )

            if (epoch + 1) % cfg.eval_every_epoch == 0:
                if evaluator is not None and eval_store is not None and eval_result_dir:
                    scores = evaluator(
                        self, eval_store, eval_result_dir, epoch + 1, label_dir
                    )
                    if scores is not None:
                        self.eval_metrics[epoch + 1] = scores
                        if self.observer:
                            self.observer.plot_eval_metrics(
                                self.eval_metrics,
                                os.path.join(eval_result_dir, "eval_metrics.png"),
                            )
                checkpoints.save_checkpoint(
                    checkpoints.epoch_path(ckpt_dir, epoch + 1),
                    self.state.params, self.state.opt_state, epoch + 1,
                )
                checkpoints.save_checkpoint(
                    checkpoints.latest_path(ckpt_dir),
                    self.state.params, self.state.opt_state, epoch + 1,
                )
                if cfg.checkpoint_keep > 0:
                    checkpoints.prune_checkpoints(ckpt_dir, cfg.checkpoint_keep)

            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                print(f"Profiler trace written to {cfg.profile_dir}")

            if self.mlflow:
                self.mlflow.log_metric("learning_rate", lr, step=epoch)
                self.mlflow.log_metrics(avg, step=epoch)
            print(f"Epoch [{epoch+1}/{cfg.epoch}] Average Loss: {avg['total_loss']:.6f}")

        if self.mlflow:
            self.mlflow.log_param(
                "model_path", os.path.normpath(checkpoints.latest_path(ckpt_dir))
            )
