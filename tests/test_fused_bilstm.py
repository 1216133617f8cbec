"""Fused BiLSTM kernel vs the flax Bidirectional encoder LSTM."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.ops.pallas.fused_bilstm import (flip_sequences, fused_bilstm,
                                             pack_bilstm_params)


class _BiLSTM(nn.Module):
    """The exact construction used in models/layers.py::Tacotron2Encoder."""

    hidden: int = 16

    @nn.compact
    def __call__(self, x, lengths):
        bi = nn.Bidirectional(
            nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm_fwd"),
            nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm_bwd"),
            name="bilstm")
        return bi(x, seq_lengths=lengths)


def test_flip_sequences_matches_flax():
    from flax.linen.recurrent import flip_sequences as flax_flip
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 7, 4)).astype(np.float32))
    lengths = jnp.array([7, 5, 2])
    want = flax_flip(x, lengths, num_batch_dims=1, time_major=False)
    got = flip_sequences(x, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_matches_flax_bilstm_ragged():
    rng = jax.random.PRNGKey(0)
    mod = _BiLSTM(hidden=16)
    B, T, C = 3, 11, 8
    x = jax.random.normal(rng, (B, T, C))
    lengths = jnp.array([11, 8, 4], jnp.int32)
    variables = mod.init(rng, x, lengths)
    want = mod.apply(variables, x, lengths)

    # adapt param names: inside _BiLSTM the cells are auto-named
    p = variables["params"]
    cells = {f"OptimizedLSTMCell_{i}": p[f"OptimizedLSTMCell_{i}"]
             for i in range(2)}
    wf, bf, wb, bb = pack_bilstm_params(cells)
    got = fused_bilstm(x, lengths, wf, bf, wb, bb,
                       compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
