"""Persistent XLA compilation cache setup.

Engine step graphs take O(10s)–O(100s) to compile (more through a remote
compile service); a disk cache amortizes that across processes and rounds.
Called by the CLI, bench and graft entry points.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("massivedatans_tpu")

_DEFAULT_DIR = os.environ.get(
    "MDT_COMPILE_CACHE", os.path.expanduser("~/.cache/mdt_xla_cache")
)


def enable_compilation_cache(path: str | None = None) -> bool:
    """Point jax at a persistent on-disk compilation cache.

    ``MDT_COMPILE_CACHE=""`` (empty) disables the cache entirely — the
    test suite uses this: jax's executable serialization segfaults on the
    virtual-8-device sharded CPU executables when a cache write actually
    fires, and tests compile locally in seconds anyway."""
    if path is None and _DEFAULT_DIR == "":
        return False
    try:
        import jax

        cache_dir = path or _DEFAULT_DIR
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as e:  # older jax or read-only fs: non-fatal
        log.info("compilation cache unavailable: %s", e)
        return False
