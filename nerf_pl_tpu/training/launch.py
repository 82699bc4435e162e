"""Shared CLI launch helper for the six ``train_*.py`` entry scripts.

Each reference trainer repeats the same boilerplate (parse → build system →
persist config → fit, ``train.py:151-180``); here it lives once so launch
behavior (config persisted BEFORE construction so a dataset-load crash
still records it, run-dir creation) changes in one place.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

from ..config import Config, get_opts


def launch(
    system_cls: Callable,
    allowed_datasets: Optional[Sequence[str]] = None,
    argv=None,
):
    """Parse the shared CLI, persist the config into the run dir, train."""
    cfg: Config = get_opts(argv)
    if allowed_datasets is not None and cfg.dataset_name not in allowed_datasets:
        raise ValueError(
            f"--dataset_name {cfg.dataset_name!r} not supported by this "
            f"trainer (expected one of {sorted(allowed_datasets)})"
        )
    os.makedirs(os.path.join(cfg.log_dir, cfg.exp_name), exist_ok=True)
    cfg.save(os.path.join(cfg.log_dir, cfg.exp_name, "config.json"))
    system = system_cls(cfg)
    system.fit()
    return system
