"""Pallas TPU kernel: Monotonic Alignment Search, fully on-device.

Replaces the reference's host round trip (GPU->CPU numpy->Cython->GPU,
/root/reference/TTS/tts/layers/glow_tts/monotonic_align/__init__.py:34-49).
Design:

- grid over batch items; each program owns one (T_y, T_x) log-likelihood
  matrix resident in VMEM (text axis on the 128-wide lanes, mel frames on
  sublanes — column updates become single-row vector ops);
- forward pass: fori_loop over mel frames; the stay/diagonal max for ALL text
  positions is one VPU op per frame (the anti-diagonal dependency collapses
  to a lane-shifted max because scores only depend on the previous frame);
- move decisions are stored as a (T_y, T_x) byte-plane in VMEM;
- backtrack: fori_loop carrying a one-hot lane vector (current text index);
  a dot with the decision row selects the move, a lane roll applies it — no
  scalar extraction, no host sync.

Per-item sequence lengths arrive as scalar-prefetch arrays (SMEM), so ragged
batches share one compiled kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _mas_kernel(txs_ref, tys_ref, value_ref, path_ref, dec_ref, v_ref):
    b = pl.program_id(0)
    t_x = txs_ref[b]
    t_y = tys_ref[b]
    T_y, T_x = value_ref.shape[1], value_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T_x), 1)

    path_ref[0, :, :] = jnp.zeros((T_y, T_x), jnp.float32)
    v_ref[:, :] = jnp.full((1, T_x), _NEG, jnp.float32)

    def fwd(y, _):
        prev = v_ref[:, :]
        stay = jnp.where(lane == y, _NEG, prev)
        shifted = pltpu.roll(prev, 1, axis=1)
        first = jnp.where(y == 0, 0.0, _NEG)
        diag = jnp.where(lane == 0, first, shifted)
        dec_ref[pl.ds(y, 1), :] = (diag >= stay).astype(jnp.float32)
        row = value_ref[0, pl.ds(y, 1), :]
        v_ref[:, :] = jnp.maximum(stay, diag) + row
        return 0

    jax.lax.fori_loop(0, t_y, fwd, 0, unroll=False)

    def bwd(i, cur):
        y = t_y - 1 - i
        start = (lane == t_x - 1).astype(jnp.float32)
        cur = jnp.where(i == 0, start, cur)
        path_ref[0, pl.ds(y, 1), :] = cur
        d = jnp.sum(cur * dec_ref[pl.ds(y, 1), :])
        moved = pltpu.roll(cur, T_x - 1, axis=1)  # left shift by 1 (x -> x-1)
        return jnp.where((d > 0.5) & (y > 0), moved, cur)

    jax.lax.fori_loop(0, t_y, bwd, jnp.zeros((1, T_x), jnp.float32),
                      unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """value, mask: (B, T_x, T_y) -> 0/1 path (B, T_x, T_y)."""
    B, T_x, T_y = value.shape
    value = jnp.where(mask > 0, value, 0.0)
    t_xs = jnp.sum(mask[:, :, 0] > 0, axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :] > 0, axis=1).astype(jnp.int32)
    value_t = jnp.swapaxes(value, 1, 2).astype(jnp.float32)  # (B, T_y, T_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T_y, T_x), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_y, T_x), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T_y, T_x), jnp.float32),  # decision plane
            pltpu.VMEM((1, T_x), jnp.float32),    # DP row
        ],
    )
    path_t = pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T_y, T_x), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(t_xs, t_ys, value_t)
    return jnp.swapaxes(path_t, 1, 2) * mask
