"""Persistent XLA compilation cache — the precompiled-SPIR-V analog.

The reference never compiles shaders at runtime: GLSL is compiled offline
and the SPIR-V blobs are embedded in the binary
(``/root/reference/shader/shader_gen.sh``, ``src/render.rs:212-220``).
The XLA analog is JAX's persistent compilation cache: the first run pays
the compile, every later process deserializes the executable. On the
tunneled TPU backend this is dramatic — a trivial first jit measured
41.5 s cold vs 1.0 s cached — and the 512^2 step or the rasterizer cost
minutes cold.

``enable_default_cache()`` is called by every product entry point (CLI,
serve, bench, graft entry). It defers to the user: an explicit
``JAX_COMPILATION_CACHE_DIR`` env var or a prior ``jax.config`` setting
wins, and any failure (read-only home, old jax) degrades silently to
uncached compiles.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "gfx_ocean_tpu", "xla")


def enable_default_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a package default.

    Returns the active cache dir, or None if caching stayed disabled.
    """
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        return None
    if current:
        return current
    path = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything non-trivial; the tunnel makes even small
        # compiles expensive (fixed ~tens-of-seconds round trip).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - best effort
        return None
    return path
