"""Guard the driver's external gates: entry() and dryrun_multichip().

The round-1 driver artifact failed because ``dryrun_multichip`` assumed the
devices were already visible; in the driver's process the container's
sitecustomize makes the axon TPU relay (1 chip) win and env vars never reach
JAX. These tests reproduce the driver's exact invocation — a fresh process
with no XLA_FLAGS / JAX_PLATFORMS — so the gate can never silently regress.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # NOTE: JAX_PLATFORMS in the env is a NO-OP here — the container's
    # sitecustomize snapshots it away before user code runs (that's the
    # whole reason dryrun_multichip bootstraps its platform in-process).
    # Forcing CPU must happen via jax.config.update inside the subprocess.
    env.pop("JAX_PLATFORMS", None)
    return env


def test_dryrun_multichip_self_bootstraps_fresh_process():
    env = _clean_env()
    # The load-bearing scenario: env var stripped entirely (the driver's env
    # vars are snapshotted away by sitecustomize; only in-process bootstrap
    # counts). JAX_PLATFORMS removed again on purpose.
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in proc.stdout
    assert "'data': 2" in proc.stdout and "'space': 4" in proc.stdout


def test_dryrun_multichip_odd_device_count_uses_1d_mesh():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(3)"],
        cwd=ROOT, env=_clean_env(), capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(3) ok" in proc.stdout


def test_entry_compiles_single_chip():
    # Force CPU IN-PROCESS (env vars are snapshotted away, see _clean_env):
    # without this the subprocess compiles on the real TPU relay, which made
    # the CI suite contend with (and hang on) live TPU sessions. The driver
    # itself still compile-checks entry() on the real chip.
    proc = subprocess.run(
        [sys.executable, "-c",
         "import torch, jax;"  # torch first: TPU-client import-order rule
         "jax.config.update('jax_platforms', 'cpu');"
         "import __graft_entry__;"
         "fn, args = __graft_entry__.entry();"
         "out = jax.jit(fn)(*args);"
         "jax.block_until_ready(out); print('entry ok', out[3].shape)"],
        cwd=ROOT, env=_clean_env(), capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry ok" in proc.stdout
