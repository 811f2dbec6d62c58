"""Debug / observability toggles (SURVEY.md §5.1-§5.2 rebuild plan).

The reference has no tracing, sanitizers or profiling. Here:

- ``enable_debug()`` turns on NaN debugging (``jax_debug_nans``) — the
  single-controller analogue of a sanitizer run.
- ``profile_steps(...)`` captures a ``jax.profiler`` trace of a few steps
  into the checkpoint dir, viewable in TensorBoard (trace viewer).
"""

from __future__ import annotations

import contextlib
import os

import jax


def enable_debug(nans: bool = True):
    if nans:
        jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def profile_steps(logdir: str, enabled: bool = True):
    """Context manager capturing a device trace under ``logdir/profile``."""
    if not enabled:
        yield
        return
    path = os.path.join(logdir, "profile")
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
