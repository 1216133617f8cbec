"""Persistent XLA compilation cache for serving/training entry points.

Compiles through the TPU tunnel take minutes for the larger graphs; caching
them on local disk makes every entry point after the first run start in
seconds. The reference has no equivalent concern (eager torch); this is
TPU-runtime plumbing.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("TTS_TPU_COMPILE_CACHE",
                              os.path.expanduser("~/.cache/tts_tpu_xla"))


def enable_persistent_cache(cache_dir: str = _DEFAULT_DIR,
                            min_compile_secs: float = 5.0) -> None:
    """Idempotent: safe to call from every CLI main()."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
