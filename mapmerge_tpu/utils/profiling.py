"""Stage timing + profiling.

First-class replacement for the reference's ad-hoc pcl::ScopeTime RAII
timers (src/registration_visualisation.cpp:51-158): a stage timer that
blocks on device results (so on-device time is actually counted) and an
optional jax.profiler trace context (SURVEY.md §5 tracing plan).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


class StageTimes:
    """Collects named stage wall-clock times."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_holder: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            device_sync(result_holder)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        print(f"[stage] {name}: {dt * 1000.0:.1f} ms", flush=True)

    def block(self, value: Any) -> Any:
        """Block on a pytree so the enclosing stage measures device time."""
        device_sync(value)
        return value


def device_sync(tree: Any) -> Any:
    """Hard completion barrier: host-transfer one reduced scalar per leaf.

    jax.block_until_ready is NOT a reliable barrier on the experimental
    axon TPU relay (measured: it returns before execution finishes, making
    naive timings dispatch-only). A D2H transfer of a reduction result is.
    """
    import jax.numpy as jnp
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            as_f = leaf.astype(jnp.float32) if leaf.dtype == bool else leaf
            np.asarray(jnp.sum(as_f))
    return tree


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
