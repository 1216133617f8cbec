"""Glow-TTS flow decoder: time-squeeze + stacked reversible flows.

Capability parity with /root/reference/TTS/tts/layers/glow_tts/decoder.py:8-108
(squeeze/unsqueeze num_sqz=2, 12x [ActNorm -> InvConvNear -> CouplingBlock],
reversible with shared params; ``store_inverse`` is unnecessary here — the
4x4 inverses fold at trace time under jit).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tts_tpu.models.glow.flows import ActNorm, CouplingBlock, InvConvNear

Array = jnp.ndarray


def squeeze(x: Array, x_mask: Optional[Array], num_sqz: int = 2
            ) -> Tuple[Array, Array]:
    """(B, T, C) -> (B, T//s, C*s); channel index = s_idx * C + c
    (≙ decoder.py:8-22)."""
    B, T, C = x.shape
    T_sqz = (T // num_sqz) * num_sqz
    x = x[:, :T_sqz]
    x = x.reshape(B, T_sqz // num_sqz, num_sqz, C)
    x = x.reshape(B, T_sqz // num_sqz, num_sqz * C)
    if x_mask is not None:
        # a squeezed step is valid only if its last sub-frame is valid
        x_mask = x_mask[:, num_sqz - 1::num_sqz]
    else:
        x_mask = jnp.ones((B, T_sqz // num_sqz, 1), x.dtype)
    return x * x_mask, x_mask


def unsqueeze(x: Array, x_mask: Optional[Array], num_sqz: int = 2
              ) -> Tuple[Array, Array]:
    """(B, T, C*s) -> (B, T*s, C) (≙ decoder.py:25-39)."""
    B, T, C = x.shape
    x = x.reshape(B, T, num_sqz, C // num_sqz)
    x = x.reshape(B, T * num_sqz, C // num_sqz)
    if x_mask is not None:
        x_mask = jnp.repeat(x_mask, num_sqz, axis=1)
    else:
        x_mask = jnp.ones((B, T * num_sqz, 1), x.dtype)
    return x * x_mask, x_mask


class FlowDecoder(nn.Module):
    """(≙ Decoder, decoder.py:42-108)."""

    in_channels: int = 80
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    num_flow_blocks: int = 12
    num_coupling_layers: int = 4
    dropout_rate: float = 0.05
    num_splits: int = 4
    num_sqz: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0

    def setup(self):
        flows = []
        ch = self.in_channels * self.num_sqz
        for i in range(self.num_flow_blocks):
            flows.append(ActNorm(channels=ch, name=f"actnorm_{i}"))
            flows.append(InvConvNear(channels=ch, n_split=self.num_splits,
                                     name=f"invconv_{i}"))
            flows.append(CouplingBlock(
                in_channels=ch,
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                dilation_rate=self.dilation_rate,
                num_layers=self.num_coupling_layers,
                c_in_channels=self.c_in_channels,
                dropout_rate=self.dropout_rate,
                sigmoid_scale=self.sigmoid_scale,
                name=f"coupling_{i}"))
        self.flows = flows

    def __call__(self, x: Array, x_mask: Array, g: Optional[Array] = None,
                 reverse: bool = False, train: bool = True
                 ) -> Tuple[Array, Optional[Array], Array]:
        """Returns (z, total_logdet | None, squeezed mask)."""
        x, sq_mask = squeeze(x, x_mask, self.num_sqz)
        g_sq = None
        if g is not None:
            # broadcast speaker embedding over time then squeeze-match
            if g.ndim == 2:
                g_sq = jnp.broadcast_to(g[:, None, :],
                                        (x.shape[0], x.shape[1], g.shape[-1]))
            else:
                g_sq, _ = squeeze(g, x_mask, self.num_sqz)
        logdet_total = jnp.zeros((x.shape[0],), jnp.float32) if not reverse else None
        flows = self.flows if not reverse else list(reversed(self.flows))
        for flow in flows:
            if isinstance(flow, CouplingBlock):
                x, logdet = flow(x, sq_mask, g=g_sq, reverse=reverse, train=train)
            else:
                x, logdet = flow(x, sq_mask, g=g_sq, reverse=reverse)
            if not reverse and logdet is not None:
                logdet_total = logdet_total + logdet
        x, out_mask = unsqueeze(x, sq_mask, self.num_sqz)
        return x, logdet_total, out_mask
