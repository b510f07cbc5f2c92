#!/usr/bin/env python
"""CLI entry point: ``python main.py --config config/*.yml [--key val ...]``.

Same public surface as the reference (main.py:278-281): phases ``train``,
``test``, ``train_and_test``; CLI > YAML > defaults; stdout tee to
``logs/console_output_<run>.log``; MLflow experiment per run (no-op without an
mlflow install). Thin shim over :mod:`sshslie_tpu.runner` so installed wheels
(``sshslie`` console script) and the repo checkout share one orchestrator.
"""

from __future__ import annotations

from sshslie_tpu.config import Config, parse_args  # noqa: F401  (re-export)
from sshslie_tpu.runner import (  # noqa: F401  (re-export)
    cli,
    main,
    run_eval_metrics,
    run_test,
    run_train,
)

if __name__ == "__main__":
    cli()
