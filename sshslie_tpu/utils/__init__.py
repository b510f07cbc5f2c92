"""Host-side utilities: HSI I/O, normalization, augmentation, LR schedules."""

from sshslie_tpu.utils.io_hsi import (  # noqa: F401
    load_hsi,
    save_hsi,
    self_normalization,
    global_normalization,
    per_channel_normalization,
    per_channel_standardization,
    inverse_global_normalization,
    inverse_per_channel_normalization,
    inverse_per_channel_standardization,
    select_hsi_wavelengths,
)
from sshslie_tpu.utils.augment import data_augmentation, augment_batch_jax  # noqa: F401
