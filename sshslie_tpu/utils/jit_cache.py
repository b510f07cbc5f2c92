"""Persistent XLA compilation cache policy (shared by main.py and bench.py).

Enabled on accelerator backends only: XLA:CPU AOT cache entries pin the
compile machine's ISA features and can SIGILL on a different host.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = "~/.cache/sshslie_tpu/xla"  # keep in sync with config.jit_cache_dir default


def enable(cache_dir: str = DEFAULT_DIR) -> Optional[str]:
    """Configure jax's persistent compile cache; returns the dir or None.

    Call before the first compilation. '' disables.
    """
    import jax

    if not cache_dir or jax.default_backend() == "cpu":
        return None
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
