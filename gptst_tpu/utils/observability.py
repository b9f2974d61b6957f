"""Observability: profiling, step timing, determinism, model stats.

The reference has only a wall-clock total and an unused CUDA memory
probe (`model/BasicTrainer.py:133,182-183`, `lib/TrainInits.py:41-54`).
TPU-native replacements:

  * `profile_trace` — context manager around `jax.profiler` writing a
    TensorBoard-loadable trace (XLA op breakdown, HBM usage).
  * `StepTimer` — `block_until_ready`-bracketed moving-average step
    timer with samples/s.
  * `init_determinism` — numpy seeding + `jax_debug_nans` gate, the
    counterpart of `lib/TrainInits.py:5-16` (JAX PRNG is explicit, so
    the seed lives in the PRNG keys, not global state).
  * `count_parameters` — `print_model_parameters` equivalent.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Optional

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace when `log_dir` is set, else no-op."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing; call `tick(n_samples)` after
    blocking on the step's outputs."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self.samples = 0
        self._last = time.perf_counter()

    def tick(self, n_samples: int = 0) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
            self.samples += n_samples
        return dt

    @property
    def mean_step_s(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n

    @property
    def samples_per_s(self) -> float:
        return self.samples / self.total if self.total > 0 else 0.0


def init_determinism(seed: int, seed_mode: bool = True,
                     debug_nans: bool = False) -> None:
    """Counterpart of `lib/TrainInits.py:5-16`: numpy/global seeding and
    the nan-check gate. JAX computations take explicit PRNG keys, so
    determinism there is structural; `seed_mode=False` matches the
    reference's non-deterministic toggle by leaving numpy unseeded."""
    if seed_mode:
        np.random.seed(seed)
    if debug_nans:
        jax.config.update("jax_debug_nans", True)


def count_parameters(params: Any, logger=None) -> int:
    """Total parameter count (`lib/TrainInits.py:41-48`)."""
    total = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
    if logger is not None:
        logger.info("Total trainable parameters: %s", f"{total:,}")
    return total


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend reports them
    (counterpart of `lib/TrainInits.py:51-54`)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
