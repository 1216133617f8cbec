"""MAS tests: jnp/C++/numpy/Pallas(interpret) implementations must agree
exactly with the reference Cython semantics (SURVEY.md §7 hard-parts #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.ops.mas import (
    generate_path, maximum_path, maximum_path_jnp, maximum_path_numpy,
)
from tts_tpu.ops.masking import sequence_mask


def _random_problem(rng, B=3, T_x=11, T_y=23, ragged=True):
    value = rng.standard_normal((B, T_x, T_y)).astype(np.float32)
    if ragged:
        t_xs = rng.integers(T_x // 2, T_x + 1, B)
        t_ys = rng.integers(T_y // 2, T_y + 1, B)
        t_ys = np.maximum(t_ys, t_xs)  # need t_y >= t_x for a valid path
    else:
        t_xs = np.full(B, T_x)
        t_ys = np.full(B, T_y)
    mask = (sequence_mask(jnp.asarray(t_xs), T_x)[:, :, None]
            & sequence_mask(jnp.asarray(t_ys), T_y)[:, None, :]).astype(jnp.float32)
    return jnp.asarray(value), mask, t_xs, t_ys


def _check_path_valid(path, t_xs, t_ys):
    path = np.asarray(path)
    for b in range(path.shape[0]):
        p = path[b, : t_xs[b], : t_ys[b]]
        # exactly one x per column
        np.testing.assert_array_equal(p.sum(axis=0), 1.0)
        # monotonic non-decreasing x, starts at 0, ends at t_x-1
        xs = p.argmax(axis=0)
        assert xs[0] == 0 and xs[-1] == t_xs[b] - 1
        assert ((np.diff(xs) == 0) | (np.diff(xs) == 1)).all()
        # nothing outside the valid region
        assert path[b, t_xs[b]:, :].sum() == 0
        assert path[b, :, t_ys[b]:].sum() == 0


class TestNumpyOracle:
    def test_valid_paths(self):
        rng = np.random.default_rng(0)
        value, mask, t_xs, t_ys = _random_problem(rng)
        path = maximum_path_numpy(np.asarray(value), np.asarray(mask))
        _check_path_valid(path, t_xs, t_ys)

    def test_picks_high_likelihood_diagonal(self):
        # likelihood concentrated on the diagonal -> path follows it
        T = 8
        value = np.full((1, T, T), -5.0, np.float32)
        for i in range(T):
            value[0, i, i] = 5.0
        mask = np.ones((1, T, T), np.float32)
        path = maximum_path_numpy(value, mask)
        np.testing.assert_array_equal(path[0], np.eye(T))


class TestJnpMatchesOracle:
    @pytest.mark.parametrize("ragged", [False, True])
    def test_exact_match(self, ragged):
        rng = np.random.default_rng(1)
        for trial in range(5):
            value, mask, t_xs, t_ys = _random_problem(
                rng, B=4, T_x=13, T_y=29, ragged=ragged)
            expected = maximum_path_numpy(np.asarray(value), np.asarray(mask))
            got = np.asarray(maximum_path_jnp(value, mask))
            np.testing.assert_array_equal(got, expected)

    def test_jit_compatible(self):
        rng = np.random.default_rng(2)
        value, mask, t_xs, t_ys = _random_problem(rng)
        jitted = jax.jit(maximum_path_jnp)
        path = jitted(value, mask)
        _check_path_valid(path, t_xs, t_ys)

    def test_t_y_equals_t_x(self):
        """Degenerate: one frame per token -> forced diagonal."""
        rng = np.random.default_rng(3)
        T = 6
        value = jnp.asarray(rng.standard_normal((2, T, T)), jnp.float32)
        mask = jnp.ones((2, T, T))
        path = np.asarray(maximum_path_jnp(value, mask))
        for b in range(2):
            np.testing.assert_array_equal(path[b], np.eye(T))


class TestCppMatchesOracle:
    def test_exact_match(self):
        pytest.importorskip("ctypes")
        from tts_tpu.ops.mas import maximum_path_cpp

        rng = np.random.default_rng(4)
        value, mask, t_xs, t_ys = _random_problem(rng, B=5, T_x=17, T_y=31)
        expected = maximum_path_numpy(np.asarray(value), np.asarray(mask))
        got = maximum_path_cpp(np.asarray(value), np.asarray(mask))
        np.testing.assert_array_equal(got, expected)


class TestPallasInterpret:
    def test_exact_match_interpret(self):
        """Pallas kernel in interpreter mode (CPU) must match the oracle."""
        from tts_tpu.ops.pallas.mas_kernel import maximum_path_pallas

        rng = np.random.default_rng(5)
        value, mask, t_xs, t_ys = _random_problem(rng, B=3, T_x=9, T_y=15)
        expected = maximum_path_numpy(np.asarray(value), np.asarray(mask))
        got = np.asarray(maximum_path_pallas(value, mask, interpret=True))
        np.testing.assert_array_equal(got, expected)


class TestDispatch:
    def test_impl_jnp(self):
        rng = np.random.default_rng(6)
        value, mask, t_xs, t_ys = _random_problem(rng)
        _check_path_valid(maximum_path(value, mask, impl="jnp"), t_xs, t_ys)


class TestGeneratePath:
    def test_durations_to_path(self):
        durations = jnp.asarray([[2, 3, 1], [1, 1, 1]], jnp.int32)
        mask = jnp.ones((2, 3, 6))
        mask = mask.at[1, :, 3:].set(0)
        path = np.asarray(generate_path(durations, mask))
        np.testing.assert_array_equal(
            path[0], [[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0],
                      [0, 0, 0, 0, 0, 1]])
        np.testing.assert_array_equal(
            path[1, :, :3], np.eye(3))

    def test_path_consistency_with_mas(self):
        """generate_path(durations from MAS path) == MAS path."""
        rng = np.random.default_rng(7)
        value, mask, t_xs, t_ys = _random_problem(rng, B=2, T_x=7, T_y=19)
        path = maximum_path_jnp(value, mask)
        durations = path.sum(axis=-1).astype(jnp.int32)
        rebuilt = generate_path(durations, mask)
        np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(path))
