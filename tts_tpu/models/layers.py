"""Shared NN building blocks for the spectrogram models.

Re-designs of /root/reference/TTS/tts/layers/common_layers.py (Prenet,
Linear/LinearBN) and /root/reference/TTS/tts/layers/tacotron2.py
(ConvBNBlock, Postnet, Encoder, StopNet) as flax modules. Convolutions are
NWC (batch, time, channels) — the TPU-natural layout with channels on lanes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class Prenet(nn.Module):
    """Bottleneck MLP with always-on dropout (≙ common_layers.py:53-82).

    Dropout stays active at inference — it is load-bearing for Tacotron2
    autoregressive stability (same as the reference).
    """

    out_features: Sequence[int] = (256, 256)
    prenet_type: str = "original"  # or "bn"
    dropout: bool = True
    dropout_rate: float = 0.5
    use_bias: bool = True  # tacotron2 decoder prenet uses bias=False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = False) -> Array:
        for i, dim in enumerate(self.out_features):
            x = nn.Dense(dim, use_bias=self.use_bias, name=f"linear_{i}")(x)
            if self.prenet_type == "bn":
                x = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, name=f"bn_{i}")(x)
            x = nn.relu(x)
            if self.dropout and self.prenet_type == "original":
                # dropout gated by train mode, matching the reference's
                # F.dropout(training=self.training) (common_layers.py:75-82)
                x = nn.Dropout(self.dropout_rate,
                               deterministic=deterministic)(x)
        return x


class ConvBNBlock(nn.Module):
    """conv1d -> batchnorm -> activation -> dropout (≙ tacotron2.py:9-44)."""

    out_channels: int
    kernel_size: int
    activation: str = "relu"  # "relu" | "tanh" | "linear"
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        # bias-free conv: the following BatchNorm mean-subtraction makes a
        # conv bias structurally gradient-free
        x = nn.Conv(self.out_channels, kernel_size=(self.kernel_size,),
                    padding="SAME", use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class Postnet(nn.Module):
    """5x conv(512, k=5) refinement stack (≙ tacotron2.py:47-72)."""

    out_channels: int  # final projection back to n_mels
    num_convs: int = 5
    hidden_channels: int = 512

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        for i in range(self.num_convs - 1):
            x = ConvBNBlock(self.hidden_channels, 5, activation="tanh",
                            name=f"conv_{i}")(x, train)
        x = ConvBNBlock(self.out_channels, 5, activation="linear",
                        name=f"conv_{self.num_convs - 1}")(x, train)
        return x


class Tacotron2Encoder(nn.Module):
    """3x ConvBN + BiLSTM over char embeddings (≙ tacotron2.py:75-121)."""

    hidden_channels: int = 512

    @nn.compact
    def __call__(self, x: Array, input_lengths: Array, train: bool = True,
                 mask_pads: bool = False) -> Array:
        mask = None
        if mask_pads:
            # zero pad positions after every conv so each layer sees exactly
            # the SAME-padding zeros an unpadded run would (bias/BN give pad
            # columns nonzero outputs otherwise, which the next conv's
            # receptive field reads near the boundary) — makes serving's
            # text-length bucketing bit-exact; training keeps the
            # reference's unmasked-conv semantics for torch parity
            from tts_tpu.ops.masking import sequence_mask
            mask = sequence_mask(input_lengths, x.shape[1]
                                 ).astype(x.dtype)[..., None]
            x = x * mask
        for i in range(3):
            x = ConvBNBlock(self.hidden_channels, 5, activation="relu",
                            name=f"conv_{i}")(x, train)
            if mask is not None:
                x = x * mask
        # BiLSTM, half the channels each direction. Padded region is excluded
        # downstream via attention masks (≙ packed sequences in the reference).
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.hidden_channels // 2),
                      name="lstm_fwd")
        bi = nn.Bidirectional(
            lstm,
            nn.RNN(nn.OptimizedLSTMCell(self.hidden_channels // 2),
                   name="lstm_bwd"),
            name="bilstm")
        return bi(x, seq_lengths=input_lengths)


class StopNet(nn.Module):
    """Stop-token head with dropout (≙ tacotron2.py layers StopNet l.498-514 of
    tacotron.py / tacotron2.py:123-133)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(1, name="linear")(x).squeeze(-1)
