"""Tracing / profiling / debugging aids (SURVEY.md §5.1-5.3).

The reference's observability was Lightning's built-in profiler +
cuDNN autotune (``train.py:177-178``) and nothing for NaN debugging or
fault tolerance.  TPU-native equivalents:

  * ``profile_trace`` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (inspect kernels with the TB profile plugin
    or xprof);
  * ``enable_nan_debugging`` — flips ``jax_debug_nans`` (reference
    acknowledges NaN fragility in the shadow path,
    ``rendering_shadows.py:356-357``; the torch anomaly-detect line is
    commented out at ``train_efficient_sm.py:35``);
  * ``xla_dump`` — point XLA at a dump dir for HLO inspection;
  * ``install_preemption_handler`` — SIGTERM-triggered checkpoint save for
    preemptible TPU fleets (the reference's only recovery story is manual
    ``--ckpt_path`` resume, ``opt.py:42``).
"""
from __future__ import annotations

import contextlib
import os
import signal
from typing import Callable

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """``with profile_trace('logs/exp/trace'): step()`` → TB trace."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def enable_compilation_cache(cache_dir: str = "~/.cache/nerf_pl_tpu_xla") -> None:
    """Persistent XLA compilation cache: first compiles of the big epoch
    programs take minutes (especially on remote-tunneled backends); cached
    reloads across processes are near-instant."""
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def xla_dump(dump_dir: str) -> None:
    """Must be called before the first compilation to take effect."""
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={dump_dir}".strip()


def install_preemption_handler(save_fn: Callable[[], None],
                               sig: int = signal.SIGTERM) -> None:
    """Invoke ``save_fn`` (e.g. ``lambda: system.save_ckpt(...)``) on
    preemption, then re-raise the default behavior."""
    prev = signal.getsignal(sig)

    def handler(signum, frame):
        try:
            save_fn()
        finally:
            if prev is signal.SIG_IGN:
                pass  # the launcher ignored this signal on purpose
            elif callable(prev):
                prev(signum, frame)
            else:
                signal.signal(sig, signal.SIG_DFL)
                signal.raise_signal(sig)

    signal.signal(sig, handler)


class StepTimer:
    """Rays/s + step-time counters (the reference published 0.12 s/step —
    ``README.md:136-142``; this is the framework's equivalent metric)."""

    def __init__(self):
        self.steps = 0
        self.rays = 0
        self.seconds = 0.0

    def update(self, n_rays: int, dt: float):
        self.steps += 1
        self.rays += n_rays
        self.seconds += dt

    @property
    def rays_per_s(self) -> float:
        return self.rays / max(self.seconds, 1e-9)

    @property
    def ms_per_step(self) -> float:
        return 1000.0 * self.seconds / max(self.steps, 1)
