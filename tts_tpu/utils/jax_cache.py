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
    """Idempotent: safe to call from every CLI main().

    First-boot seeding: if the cache dir has no entries and a seed
    directory exists (``TTS_TPU_CACHE_SEED`` env var, or the wheel's
    ``tts_tpu/server/cache_seed/`` package data — produced by
    ``python -m tts_tpu.server.server --prewarm --exit-after-prewarm``
    at wheel-build time), its entries are hard-linked/copied in, so a
    brand-new machine skips the minutes-long tunnel compiles entirely
    (the reference's Flask server boots in seconds because eager torch
    never compiles; this is the XLA-runtime equivalent)."""
    import jax

    _maybe_seed(cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


def export_cache(dst: str, cache_dir: str = None) -> int:
    """Copy the persistent cache's entries into ``dst`` (a seed artifact
    for packaging — the inverse of _maybe_seed). Returns the entry count."""
    import shutil

    cache_dir = cache_dir or os.environ.get("TTS_TPU_COMPILE_CACHE",
                                            _DEFAULT_DIR)
    os.makedirs(dst, exist_ok=True)
    n = 0
    if os.path.isdir(cache_dir):
        for name in os.listdir(cache_dir):
            src = os.path.join(cache_dir, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(dst, name))
                n += 1
    return n


def _seed_dirs():
    cands = []
    env = os.environ.get("TTS_TPU_CACHE_SEED")
    if env:
        cands.append(env)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands.append(os.path.join(here, "server", "cache_seed"))
    return [d for d in cands if os.path.isdir(d)]


def _maybe_seed(cache_dir: str) -> None:
    """Copy seed entries into an empty (or missing) cache dir. Entries are
    content-addressed by XLA, so copying never corrupts; existing files are
    left alone."""
    import shutil

    seeds = _seed_dirs()
    if not seeds:
        return
    os.makedirs(cache_dir, exist_ok=True)
    have = set(os.listdir(cache_dir))
    for seed in seeds:
        for name in os.listdir(seed):
            if name in have:
                continue
            src = os.path.join(seed, name)
            if not os.path.isfile(src):
                continue
            dst = os.path.join(cache_dir, name)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
