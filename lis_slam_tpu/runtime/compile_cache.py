"""Persistent executable cache — the TensorRT engine-serialization parity.

The reference builds its TensorRT engine once and serializes it next to the
model (`model.trt`, netTensorRT.cpp:571-586) so every later launch
deserializes instead of re-building. The XLA equivalent is the persistent
compilation cache: jitted programs are keyed by (HLO, compile options,
backend version) and re-loaded from disk on later runs, which matters here
because a cold compile of the fused per-scan program through a tunneled TPU
backend costs minutes.

Usage: call :func:`enable_compilation_cache` once, before the first jitted
call (any time before is fine — the cache config is global). It is wired
into ``bench.py`` and ``examples/run_kitti.py`` and controlled by the
``LIS_COMPILE_CACHE`` env var (a directory; empty/``0`` disables).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/lis_slam_tpu/xla_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory actually used, or None when disabled/unsupported
    (older jaxlib, read-only filesystem, backend without cache support —
    all degrade to cold compiles, never to an error).
    """
    env = os.environ.get("LIS_COMPILE_CACHE")
    if env is not None and env.strip().lower() in ("", "0", "off", "none",
                                                   "false", "disabled"):
        return None
    d = cache_dir or env or DEFAULT_DIR
    try:
        os.makedirs(d, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
    except Exception:  # pragma: no cover - old jaxlib knob names / RO fs
        try:
            from jax.experimental.compilation_cache import compilation_cache

            compilation_cache.set_cache_dir(d)  # type: ignore[attr-defined]
            return d
        except Exception:
            return None
    # cache every program, however small/fast it compiled: the win here is
    # the tunnel round-trip, not local compile CPU time. Each knob is
    # optional (older jaxlib may lack it); a missing knob must not discard
    # the successfully-set cache dir above.
    for knob, val in (
        ("jax_persistent_cache_min_compile_time_secs", 0.0),
        ("jax_persistent_cache_min_entry_size_bytes", -1),
    ):
        try:
            jax.config.update(knob, val)
        except Exception:  # pragma: no cover - knob absent in old jaxlib
            pass
    return d
