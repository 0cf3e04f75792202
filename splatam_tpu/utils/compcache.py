"""Persistent XLA compilation cache.

The SLAM frame loop recompiles its phase programs whenever the active-map
bucket or the pair budget crosses a granularity boundary (slam/pipeline.py
_bucket/_phase_rcfg). Within a run the bucket ladder is short, but every
fresh process used to re-pay every compile (~60-120 s spikes at frames 0/1
and each bucket crossing — see BENCH_r01.json). Enabling jax's persistent
compilation cache makes every compile after the first process a disk hit.
"""
from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable jax's persistent compilation cache.

    Returns the cache directory in use. Respects an explicit
    JAX_COMPILATION_CACHE_DIR / SPLATAM_COMP_CACHE env override; defaults to
    a shared per-user dir so separate runs (tests, bench, scripts) hit the
    same cache.
    """
    global _ENABLED
    import jax

    if cache_dir is None:
        cache_dir = (
            os.environ.get("SPLATAM_COMP_CACHE")
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "splatam_tpu",
                "xla_cache",
            )
        )
    if _ENABLED:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the phase programs we care about take 10-100 s to
    # compile, but even the small helper jits add up across processes.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = True
    return cache_dir
