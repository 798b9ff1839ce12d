"""Persistent XLA compilation cache wiring (round-3 verdict item 5).

The headline program took 229 s to compile cold in round 2 (BENCH_r02) and
every `Renderer.set_option` change pays a recompile.  JAX ships a
persistent on-disk compilation cache; this module turns it on once per
process with conservative thresholds so the viewer's first frame, repeat
benchmark runs, and param-toggle re-renders hit the disk cache instead of
the compiler.

The cache location defaults to ``~/.cache/tpu_pathtracer/xla`` and can be
overridden with ``TPU_PATHTRACER_CACHE_DIR`` (empty string disables).
Safe to call multiple times; never raises (older jax versions without the
config knobs just skip them).
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the directory in
    use (None if disabled or unsupported)."""
    global _enabled
    env_dir = os.environ.get("TPU_PATHTRACER_CACHE_DIR")
    if env_dir == "":
        return None
    cache_dir = cache_dir or env_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "tpu_pathtracer", "xla"
    )
    try:
        import jax

        if _enabled:
            return cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program that took noticeable compile time, not just
        # the >1 s default, and regardless of size.
        for knob, value in (
            ("jax_persistent_cache_min_compile_time_secs", 0.1),
            ("jax_persistent_cache_min_entry_size_bytes", 0),
        ):
            try:
                jax.config.update(knob, value)
            except (AttributeError, ValueError):
                pass
        _enabled = True
        return cache_dir
    except Exception:
        return None
