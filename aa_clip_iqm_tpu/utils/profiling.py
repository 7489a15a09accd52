"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5: tqdm bars only). TPU-native
observability here is:
  - jax.profiler device traces (Perfetto/XProf-compatible) via `trace()`;
  - named step annotations (`step_annotation`) so train/eval steps show up
    as labelled ranges in the trace;
  - a lightweight StepTimer with forced device synchronization — note that
    `block_until_ready` alone does not synchronize through remote-execution
    tunnels, so the timer fetches a tiny scalar;
  - debug_nans toggle (jax_debug_nans) as the sanitizer analogue.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Device trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named range for profiler timelines."""
    return jax.profiler.StepTraceAnnotation(name)


def sync(tree) -> None:
    """Force completion of all computations producing `tree`. Fetches one
    scalar per leaf's first element, which round-trips even on remote
    backends where block_until_ready returns early."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        jax.block_until_ready(leaves)
        np.asarray(leaves[0]).ravel()[:1]


class StepTimer:
    """Running mean/percentile step timer with device sync."""

    def __init__(self):
        self.samples = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            sync(outputs)
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def enable_nan_checks(enable: bool = True):
    """jax_debug_nans: the framework's race-detector/sanitizer analogue
    (SURVEY.md §5 — the reference has no sanitizers; numerics checking is
    what applies to a functional array program)."""
    jax.config.update("jax_debug_nans", enable)
