"""Persistent XLA compilation cache wiring (utils/runtime.py)."""

import os
import subprocess
import sys

from maxsquareloss_tpu.utils.runtime import resolve_compilation_cache_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolve_compilation_cache_dir(monkeypatch):
    assert resolve_compilation_cache_dir("") is None
    assert resolve_compilation_cache_dir(None) is None
    assert resolve_compilation_cache_dir("/x/y") == "/x/y"
    monkeypatch.setenv("XDG_CACHE_HOME", "/cachehome")
    assert resolve_compilation_cache_dir("auto") == (
        "/cachehome/maxsquareloss_tpu/xla"
    )
    monkeypatch.delenv("XDG_CACHE_HOME")
    assert resolve_compilation_cache_dir("auto").startswith(
        os.path.expanduser("~/.cache")
    )


_CHILD = """
import sys
from maxsquareloss_tpu.utils.runtime import setup_compilation_cache
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
assert setup_compilation_cache(sys.argv[1]) == sys.argv[1]
import jax.numpy as jnp

@jax.jit
def f(x):
    return (x * 2.0 + 1.0).sum()

print(float(f(jnp.arange(1024, dtype=jnp.float32))))
"""


def test_compilation_cache_persists_across_processes(tmp_path):
    """First process writes a cache entry; a second identical process adds
    none (the compile is served from the cache). Runs in subprocesses so
    the global jax config of the test process is untouched."""
    cache = str(tmp_path / "xla")
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )

    def run():
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, cache],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr
        return r.stdout.strip()

    out1 = run()
    entries = os.listdir(cache)
    assert entries, "no cache entry written"
    out2 = run()
    assert out2 == out1
    assert sorted(os.listdir(cache)) == sorted(entries), (
        "second process recompiled instead of hitting the cache"
    )
