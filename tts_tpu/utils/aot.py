"""On-disk AOT-serialized executables for serving graphs.

The persistent XLA compilation cache removes recompiles, but on the axon
TPU runtime a cache HIT still pays a 16-23 s remote executable link/load
per graph at first execution (measured, scripts/probe_cold_start.py).
``jax.experimental.serialize_executable`` skips that too: deserializing a
pickled compiled executable takes ~0.08 s and first execution ~1 s
(measured 2026-08-21). This module wraps ``jax.jit`` with a per-shape
on-disk store of serialized executables so a server boot goes straight to
warm-request latency.

Keying: (name, arg shapes/dtypes, jaxlib version, backend platform_version)
— any mismatch, unpickling error, or runtime rejection falls back to a
normal jit compile (and refreshes the stored executable). Entries live
next to the XLA cache (``~/.cache/tts_tpu_aot`` or $TTS_TPU_AOT_CACHE) and
can be shipped to identical machines like the compilation-cache seed.

The reference has no analogue (eager torch); this is XLA-runtime plumbing
(≙ the boots-in-seconds bar of /root/reference/TTS/server/server.py:63-86).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
from typing import Any, Callable, Dict

import jax

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.environ.get("TTS_TPU_AOT_CACHE",
                              os.path.expanduser("~/.cache/tts_tpu_aot"))


def _tree_sig(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{shape}:{dtype}")
    return "|".join(parts)


import functools


@functools.lru_cache(maxsize=1)
def _backend_sig() -> str:
    # public APIs only (jax._src imports broke across upgrades — ADVICE r4)
    import jax
    dev = jax.devices()[0]
    platform_version = getattr(getattr(dev, "client", None),
                               "platform_version", "unknown")
    return f"{jax.__version__}|{dev.platform}|{platform_version}"


def _key(name: str, args) -> str:
    h = hashlib.sha256()
    h.update(name.encode())
    h.update(_tree_sig(args).encode())
    h.update(_backend_sig().encode())
    return h.hexdigest()[:32]


class AotJit:
    """jit with per-shape on-disk AOT executable caching.

    ``AotJit(fn, "mega")(*args)`` behaves like ``jax.jit(fn)(*args)`` but
    persists each shape-specialization's compiled executable and restores
    it in later processes without recompiling OR re-linking.
    """

    def __init__(self, fn: Callable, name: str, cache_dir: str = None,
                 enable: bool = None):
        self.fn = fn
        self.name = name
        self.cache_dir = cache_dir or _DEFAULT_DIR
        if enable is None:
            # OPT-IN (TTS_TPU_AOT=1): on the axon tunnel runtime,
            # deserialize_and_load RECOMPILES under the hood (measured
            # 2026-08-21: restored-TTS-graph first request 190 s vs 16-23 s
            # via the persistent compilation cache — the 1.1 s restore seen
            # in probe_aot was the remote service's own still-warm cache).
            # On direct-attached TPU runtimes the restore path is the
            # documented fast path; enable it there.
            enable = (jax.default_backend() == "tpu"
                      and os.environ.get("TTS_TPU_AOT", "0") == "1")
        self.enable = enable
        self._compiled: Dict[str, Any] = {}
        self._jitted = jax.jit(fn)

    def __call__(self, *args):
        if not self.enable:
            return self._jitted(*args)
        # per-call cost is one O(leaves) shape/dtype walk (~us even for
        # large param trees; the backend sig is lru-cached) — negligible
        # next to the ms-scale executions this wraps
        key = _key(self.name, args)
        compiled = self._compiled.get(key)
        if compiled is None:
            compiled = self._load_or_compile(key, args)
            self._compiled[key] = compiled
        return compiled(*args)

    def _load_or_compile(self, key: str, args):
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        path = os.path.join(self.cache_dir, f"{self.name}-{key}.aot")
        if os.path.isfile(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                # pin execution to device 0: the serving graphs are
                # single-device, and without this the loader maps onto ALL
                # addressable devices (wrong shard count on multi-device
                # hosts, e.g. the 8-virtual-device test env)
                compiled = deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=[jax.devices()[0]])
                logger.info("AOT: restored %s from %s", self.name, path)
                return compiled
            except Exception as e:  # stale/foreign entry -> recompile
                logger.warning("AOT: restore of %s failed (%s); recompiling",
                               path, e)
        compiled = self._jitted.lower(*args).compile()
        try:
            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(self.cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=self.cache_dir)
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)  # atomic: concurrent boots see old or new
            logger.info("AOT: stored %s -> %s", self.name, path)
        except Exception as e:  # serialization unsupported -> plain jit
            logger.warning("AOT: could not serialize %s (%s)", self.name, e)
        return compiled
