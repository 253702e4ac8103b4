"""Logging / observability.

Behavioral reference: ED/main_pretrain.py:81-95 — Python logging to `log.txt`
plus stderr, rank-0 gated via `main_process()`.  Here: process-0 gating via
`jax.process_index()`, structured metric lines, and deterministic seeding
helpers (the reference's cudnn.deterministic + per-rank reseed,
ED/main_pretrain.py:97-107,448-449).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_logger(
    name: str = "samrs_tpu", log_dir: Optional[str] = None, level: int = logging.INFO
) -> logging.Logger:
    """stderr + optional `log.txt` file handler, rank-0 only for the file."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s")
        )
        logger.addHandler(sh)
        if log_dir and is_main_process():
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(
                logging.Formatter("[%(asctime)s %(levelname)s] %(message)s")
            )
            logger.addHandler(fh)
    return logger


def log_metrics(logger: logging.Logger, step: int, metrics: Dict[str, Any]) -> None:
    parts = " ".join(
        f"{k}={float(v):.5g}" if hasattr(v, "__float__") else f"{k}={v}"
        for k, v in metrics.items()
    )
    logger.info("step %d %s", step, parts)


def seed_everything(seed: int) -> jax.Array:
    """Deterministic seeding: one PRNGKey folded with the process index
    (the per-rank reseed 2023+LOCAL_RANK analogue).  JAX computations are
    deterministic by construction — no cudnn knobs needed."""
    import numpy as np
    import random

    random.seed(seed)
    np.random.seed(seed % 2**32)
    return jax.random.fold_in(jax.random.PRNGKey(seed), jax.process_index())
