"""Patch augmentation: the 8 flip/rot modes of reference utils.py:7-34.

Two implementations:
  * :func:`data_augmentation` — host-side numpy, exact reference semantics
    (mode-by-mode table below), for the host input pipeline.
  * :func:`augment_batch_jax` — vectorized on-device version using
    ``lax.switch`` over the 8 modes, for fully-jitted input pipelines where
    the patch batch is already on the TPU.

Mode table (reference utils.py:7-34):
  0: identity
  1: flipud
  2: rot90
  3: rot90 + flipud
  4: rot180
  5: rot180 + flipud
  6: rot270
  7: rot270 + flipud
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def data_augmentation(image: np.ndarray, mode: int) -> np.ndarray:
    """Apply one of 8 flip/rotation modes to an (H, W, C) patch."""
    if mode == 0:
        return image
    if mode == 1:
        return np.flipud(image)
    if mode == 2:
        return np.rot90(image)
    if mode == 3:
        return np.flipud(np.rot90(image))
    if mode == 4:
        return np.rot90(image, k=2)
    if mode == 5:
        return np.flipud(np.rot90(image, k=2))
    if mode == 6:
        return np.rot90(image, k=3)
    if mode == 7:
        return np.flipud(np.rot90(image, k=3))
    raise ValueError(f"augmentation mode must be in [0, 8), got {mode}")


def _aug_one(patch: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """Jax augmentation of a single (H, W, C) square patch by traced mode."""
    branches = [
        lambda p: p,
        lambda p: jnp.flipud(p),
        lambda p: jnp.rot90(p),
        lambda p: jnp.flipud(jnp.rot90(p)),
        lambda p: jnp.rot90(p, k=2),
        lambda p: jnp.flipud(jnp.rot90(p, k=2)),
        lambda p: jnp.rot90(p, k=3),
        lambda p: jnp.flipud(jnp.rot90(p, k=3)),
    ]
    return jax.lax.switch(mode, branches, patch)


def augment_batch_jax(patches: jnp.ndarray, modes: jnp.ndarray) -> jnp.ndarray:
    """Vectorized augmentation of a (B, H, W, C) batch by per-sample modes.

    Requires square patches (H == W) so all 8 branches have equal shapes —
    true for the training pipeline (patch_size × patch_size crops).
    
    Contract note: ``lax.switch`` CLAMPS out-of-range modes to [0, 7]
    on device (no data-dependent errors under jit), whereas the host
    ``data_augmentation`` raises — mode generators must stay in range
    (both pipelines draw via randint(0, 8)).
    """
    return jax.vmap(_aug_one)(patches, modes)
