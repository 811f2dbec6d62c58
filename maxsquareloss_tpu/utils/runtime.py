"""Process-level runtime knobs shared by the CLIs.

The persistent compilation cache removes the repeated-XLA-compile cost
across CLI invocations: train -> resume -> evaluate each pay tens of
seconds of TPU compiles otherwise (BASELINE.md "The real CLI stack on the
TPU chip": ~50 s first train compile, ~60 s first eval compile). Cache
entries are serialized executables keyed on HLO + compile options +
backend/platform version, so shape/config changes miss cleanly and the
per-compile ``compiler_options`` (--xla_options) participate in the key.
jax only persists compiles that took >= 1 s by default
(``jax_persistent_cache_min_compile_time_secs``) — tiny graphs stay
uncached.
"""

from __future__ import annotations

import os


def resolve_compilation_cache_dir(spec: str | None) -> str | None:
    """'' / None = disabled; 'auto' = XDG cache dir; else a literal path."""
    if not spec:
        return None
    if spec == "auto":
        base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser(
            "~/.cache"
        )
        return os.path.join(base, "maxsquareloss_tpu", "xla")
    return spec


def setup_compilation_cache(spec: str | None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir (or None).

    Safe to call more than once and from multiple concurrent processes
    (jax writes entries atomically). Must run before the first jit
    compilation to cover it.
    """
    path = resolve_compilation_cache_dir(spec)
    if path is None:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
