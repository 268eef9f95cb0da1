"""Persistent XLA compilation cache.

Reference analogue: ShaderArtifactCache (reference:
BasicRenderer/src/Managers/ShaderArtifactCache.cpp — disk cache of compiled
DXIL/SPIR-V keyed by canonicalized source hash + compiler version). Under
XLA the compiled artifact is the whole frame executable; JAX's persistent
compilation cache keys it by HLO hash + compiler flags, so a second process
start skips the 20-40 s/FrameConfig compile.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/basicrenderer_tpu/xla")
_enabled = False


def enable_compilation_cache(path: str = None) -> bool:
    """Idempotently enable the on-disk XLA compilation cache. Safe to call
    any time (before or after backend init). Returns True when active."""
    global _enabled
    if _enabled:
        return True
    import jax
    try:
        cache_dir = path or os.environ.get(
            "BASICRENDERER_XLA_CACHE", _DEFAULT_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile (the default skips sub-second ones; our frame
        # programs are the expensive artifacts we care about, but tests also
        # benefit from caching the small kernels).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        _enabled = False
    return _enabled
