"""AOT executable store (utils/aot.py): serving graphs restore from disk
without recompiling — the cold-boot fix for the axon remote link/load
(CLAUDE.md cold-start anatomy)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.utils.aot import AotJit


def _fn(x, y):
    return jnp.tanh(x @ y) + 1.0


def test_aot_roundtrip_and_restore(tmp_path):
    x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    y = jnp.ones((4, 2), jnp.float32)

    a = AotJit(_fn, "t", cache_dir=str(tmp_path), enable=True)
    out1 = a(x, y)
    files = list(tmp_path.glob("t-*.aot"))
    assert len(files) == 1, files

    # a fresh wrapper (fresh process stand-in) restores from disk
    b = AotJit(_fn, "t", cache_dir=str(tmp_path), enable=True)
    out2 = b(x, y)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(out1),
                               np.tanh(np.asarray(x) @ np.asarray(y)) + 1.0,
                               rtol=1e-6)


def test_aot_new_shape_new_entry(tmp_path):
    a = AotJit(_fn, "s", cache_dir=str(tmp_path), enable=True)
    a(jnp.ones((2, 3)), jnp.ones((3, 2)))
    a(jnp.ones((4, 3)), jnp.ones((3, 2)))
    assert len(list(tmp_path.glob("s-*.aot"))) == 2


def test_aot_corrupt_entry_falls_back(tmp_path):
    a = AotJit(_fn, "c", cache_dir=str(tmp_path), enable=True)
    x, y = jnp.ones((2, 2)), jnp.ones((2, 2))
    a(x, y)
    path = next(tmp_path.glob("c-*.aot"))
    path.write_bytes(b"garbage")
    b = AotJit(_fn, "c", cache_dir=str(tmp_path), enable=True)
    out = b(x, y)  # must not raise; recompiles and refreshes the entry
    np.testing.assert_allclose(np.asarray(out),
                               np.tanh(np.full((2, 2), 2.0)) + 1.0)


def test_disabled_is_plain_jit(tmp_path):
    a = AotJit(_fn, "d", cache_dir=str(tmp_path), enable=False)
    a(jnp.ones((2, 2)), jnp.ones((2, 2)))
    assert list(tmp_path.glob("*.aot")) == []
