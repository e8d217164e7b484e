"""Persistent executable cache (TensorRT model.trt parity,
netTensorRT.cpp:571-586): compiled programs are serialized to disk and
re-loaded on later launches."""

import os
import subprocess
import sys

_CHILD = r"""
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache
assert enable_compilation_cache({d!r}) == {d!r}
import jax.numpy as jnp
f = jax.jit(lambda x: x @ x + 1)
f(jnp.ones((64, 64))).block_until_ready()
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(d):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("LIS_COMPILE_CACHE", None)
    subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, d=str(d))],
        check=True, env=env, timeout=300)


def test_cache_persists_and_is_reused(tmp_path):
    d = str(tmp_path / "xla_cache")
    _run(d)
    entries = os.listdir(d)
    assert entries, "first launch must serialize executables"
    mtimes = {e: os.path.getmtime(os.path.join(d, e)) for e in entries}
    _run(d)  # warm launch: same programs, loaded not re-written
    for e, m in mtimes.items():
        assert os.path.getmtime(os.path.join(d, e)) == m


def test_env_var_disables(monkeypatch, tmp_path):
    monkeypatch.setenv("LIS_COMPILE_CACHE", "off")
    from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

    assert enable_compilation_cache(str(tmp_path)) is None
