"""Test env: force CPU backend with 8 virtual devices so shard_map/psum
multi-chip paths are exercised without TPU hardware (SURVEY.md §4).

Note: the env-var JAX_PLATFORMS route does not win against the installed
'axon' TPU plugin, so we also set jax.config before any backend init.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
