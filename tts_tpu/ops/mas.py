"""Monotonic Alignment Search (MAS) — on-device Viterbi DP for Glow-TTS.

The reference implements this as a Cython/OpenMP kernel with a
device->host->device round trip on the training hot path
(/root/reference/TTS/tts/layers/glow_tts/monotonic_align/core.pyx:9-45,
__init__.py:34-49). Here the DP runs entirely on-device:

- ``maximum_path_jnp``: lax.scan over mel frames (columns); the per-column
  update is vectorized over batch x text on the VPU; the backtrack is a
  reverse scan with one-hot writes — no host sync, jittable.
- ``maximum_path_pallas``: Pallas TPU kernel (grid over batch, DP rows in
  VMEM lanes) in tts_tpu.ops.pallas.mas_kernel.
- ``maximum_path_cpp``: native C++/OpenMP host fallback (ctypes), the
  moral equivalent of the reference's Cython for CPU pipelines.

``maximum_path(value, mask)`` dispatches by backend.

Also: ``generate_path`` (duration -> hard path, ≙ monotonic_align/__init__.py:14-31).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_NEG = -1e9


def maximum_path_jnp(value: Array, mask: Array) -> Array:
    """Best monotonic alignment path.

    value: (B, T_x, T_y) log-likelihoods (text x mel); mask: same shape, 1
    inside the valid (t_x_i, t_y_i) rectangle. Returns 0/1 path of the same
    shape with exactly one active x per valid y column.
    """
    B, T_x, T_y = value.shape
    value = jnp.where(mask > 0, value, 0.0)
    t_xs = jnp.sum(mask[:, :, 0] > 0, axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :] > 0, axis=1).astype(jnp.int32)

    xs = jnp.arange(T_x)

    # ---- forward: accumulate best score per (x, y), record move decisions
    def fwd(prev_row, y):
        # stay at x (same text token): invalid when x == y (path must have
        # advanced x exactly y times to be at x == y)
        stay = jnp.where(xs[None, :] == y, _NEG, prev_row)
        # diagonal move from x-1
        shifted = jnp.pad(prev_row, ((0, 0), (1, 0)), constant_values=_NEG)[:, :-1]
        first = jnp.where(y == 0, 0.0, _NEG)
        diag = shifted.at[:, 0].set(first)
        move_diag = diag >= stay
        new_row = jnp.maximum(stay, diag) + value[:, :, y]
        return new_row, move_diag

    init = jnp.full((B, T_x), _NEG)
    _, decisions = jax.lax.scan(fwd, init, jnp.arange(T_y))
    # decisions: (T_y, B, T_x) True = came from x-1 diagonally

    # ---- backtrack: reverse scan carrying current x index per item
    def bwd(cur_x, y):
        at_start = y == (t_ys - 1)
        cur_x = jnp.where(at_start, t_xs - 1, cur_x)
        active = y < t_ys
        col = jax.nn.one_hot(cur_x, T_x, dtype=value.dtype) * active[:, None]
        d = jnp.take_along_axis(decisions[y], cur_x[:, None], axis=1)[:, 0]
        cur_x = jnp.where(active & (y > 0), cur_x - d.astype(jnp.int32), cur_x)
        return cur_x, col

    init_x = jnp.zeros((B,), jnp.int32)
    _, cols = jax.lax.scan(bwd, init_x, jnp.arange(T_y - 1, -1, -1))
    # cols: (T_y, B, T_x) in reverse y order
    path = jnp.flip(cols, axis=0).transpose(1, 2, 0)  # (B, T_x, T_y)
    return path * mask


def maximum_path_numpy(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Plain numpy reference (mirrors the Cython semantics exactly; test oracle)."""
    value = np.where(mask > 0, value, 0.0).astype(np.float64)
    B, T_x, T_y = value.shape
    path = np.zeros((B, T_x, T_y), np.float32)
    t_xs = (mask[:, :, 0] > 0).sum(1)
    t_ys = (mask[:, 0, :] > 0).sum(1)
    for b in range(B):
        t_x, t_y = int(t_xs[b]), int(t_ys[b])
        v = value[b]
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = _NEG if x == y else v[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else _NEG
                else:
                    v_prev = v[x - 1, y - 1]
                v[x, y] = max(v_cur, v_prev) + v[x, y]
        x = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[b, x, y] = 1.0
            if x != 0 and (x == y or v[x - 1, y - 1] >= v[x, y - 1]):
                x -= 1
    return path


_cpp_lib = None


def maximum_path_cpp(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Native C++/OpenMP MAS (host). Built lazily from tts_tpu/native."""
    global _cpp_lib
    if _cpp_lib is None:
        from tts_tpu.native.build import load_mas_library
        _cpp_lib = load_mas_library()
    import ctypes

    value = np.ascontiguousarray(
        np.where(mask > 0, value, 0.0), dtype=np.float32)
    B, T_x, T_y = value.shape
    path = np.zeros((B, T_x, T_y), np.int32)
    t_xs = np.ascontiguousarray((mask[:, :, 0] > 0).sum(1), np.int32)
    t_ys = np.ascontiguousarray((mask[:, 0, :] > 0).sum(1), np.int32)
    _cpp_lib.maximum_path(
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(B), ctypes.c_int(T_x), ctypes.c_int(T_y))
    return path.astype(np.float32)


def maximum_path(value: Array, mask: Array, impl: str = "auto") -> Array:
    """Dispatch: 'pallas' (TPU), 'jnp' (any backend, jittable), 'cpp', 'numpy'."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if impl == "jnp":
        return maximum_path_jnp(value, mask)
    if impl == "pallas":
        from tts_tpu.ops.pallas.mas_kernel import maximum_path_pallas
        return maximum_path_pallas(value, mask)
    if impl == "cpp":
        return jnp.asarray(maximum_path_cpp(np.asarray(value), np.asarray(mask)))
    if impl == "numpy":
        return jnp.asarray(maximum_path_numpy(np.asarray(value), np.asarray(mask)))
    raise ValueError(f"unknown MAS impl: {impl}")


def generate_path(durations: Array, mask: Array) -> Array:
    """Durations -> hard monotonic path (inference-side companion,
    ≙ generate_path, monotonic_align/__init__.py:14-31).

    durations: (B, T_x) int frame counts; mask: (B, T_x, T_y).
    """
    B, T_x, T_y = mask.shape
    cum = jnp.cumsum(durations, axis=1)  # (B, T_x) end frame per token
    ys = jnp.arange(T_y)[None, None, :]
    ends = cum[:, :, None]
    starts = jnp.concatenate([jnp.zeros((B, 1, 1)), ends[:, :-1]], axis=1)
    path = ((ys >= starts) & (ys < ends)).astype(mask.dtype)
    return path * mask
