"""Attention step modules for scan-carried autoregressive decoders.

TPU-native re-design of /root/reference/TTS/tts/layers/common_layers.py:90-389:
each attention is a pure *step function* (state in, state out) so the decoder
can carry it through ``lax.scan`` — no Python-loop state mutation. Variants:

- ``LocationSensitiveAttention`` — content + location features (conv over
  cumulated + previous alignments), optional forward-attention recursion with
  transition agent, sigmoid or softmax normalization, eval-time windowing
  (≙ OriginalAttention, common_layers.py:196-373).
- ``GravesAttention`` — K-component discretized GMM attention
  (≙ common_layers.py:113-193).

All alignment math is batched matrix/elementwise work on the VPU/MXU; no
data-dependent shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray
State = Dict[str, Array]


class LocationSensitiveAttention(nn.Module):
    attn_dim: int = 128
    location_filters: int = 32
    location_kernel_size: int = 31
    use_location: bool = True
    use_forward_attn: bool = False
    use_transition_agent: bool = False
    forward_attn_mask: bool = False
    norm: str = "softmax"  # or "sigmoid"
    windowing: bool = False
    win_back: int = 2
    win_front: int = 6
    use_v_bias: bool = False

    def setup(self):
        self.query_layer = nn.Dense(self.attn_dim, use_bias=False, name="query_layer")
        self.inputs_layer = nn.Dense(self.attn_dim, use_bias=False, name="inputs_layer")
        # default: no bias on the energy head — softmax normalization is
        # invariant to a constant energy shift, so it would be structurally
        # untrainable. Sigmoid norm (Tacotron v1) is NOT shift-invariant:
        # use_v_bias keeps the reference's bias there.
        self.v = nn.Dense(1, use_bias=self.use_v_bias, name="v")
        if self.use_location:
            self.location_conv = nn.Conv(
                self.location_filters, kernel_size=(self.location_kernel_size,),
                padding="SAME", use_bias=False, name="location_conv")
            self.location_dense = nn.Dense(self.attn_dim, use_bias=False,
                                           name="location_dense")
        if self.use_transition_agent:
            self.ta = nn.Dense(1, name="transition_agent")

    def init_state(self, batch: int, t_in: int) -> State:
        """Initial carry; forward-attn alpha starts as a delta at position 0
        with a small epsilon tail (≙ init_forward_attn, common_layers.py:244-251)."""
        state = {
            "attention_weights": jnp.zeros((batch, t_in)),
            "attention_cum": jnp.zeros((batch, t_in)),
        }
        if self.use_forward_attn:
            alpha = jnp.concatenate(
                [jnp.ones((batch, 1)), jnp.zeros((batch, t_in - 1)) + 1e-7], axis=1)
            state["alpha"] = alpha
            state["u"] = jnp.full((batch, 1), 0.5)
        return state

    def preprocess_inputs(self, inputs: Array) -> Array:
        return self.inputs_layer(inputs)

    def _energies(self, query: Array, processed_inputs: Array, state: State) -> Array:
        """(B, D_q), (B, T, A) -> (B, T) unnormalized attention energies."""
        processed_query = self.query_layer(query)[:, None, :]
        if self.use_location:
            attn_cat = jnp.stack(
                [state["attention_weights"], state["attention_cum"]], axis=-1)
            loc = self.location_dense(self.location_conv(attn_cat))
            energies = self.v(jnp.tanh(processed_query + processed_inputs + loc))
        else:
            energies = self.v(jnp.tanh(processed_query + processed_inputs))
        return energies.squeeze(-1)

    def _apply_windowing(self, energies: Array, state: State) -> Array:
        """Mask energies outside [argmax - win_back, argmax + win_front]
        (eval-only in the reference, common_layers.py:286-299)."""
        t_in = energies.shape[-1]
        center = jnp.argmax(state["attention_weights"], axis=-1, keepdims=True)
        pos = jnp.arange(t_in)[None, :]
        win_mask = (pos >= center - self.win_back) & (pos <= center + self.win_front)
        return jnp.where(win_mask, energies, -jnp.inf)

    def __call__(
        self,
        query: Array,
        inputs: Array,
        processed_inputs: Array,
        state: State,
        mask: Optional[Array] = None,
        use_windowing: bool = False,
    ) -> Tuple[Array, State]:
        """One attention step: returns (context (B, D), new_state)."""
        energies = self._energies(query, processed_inputs, state)
        if use_windowing and self.windowing:
            energies = self._apply_windowing(energies, state)
        if mask is not None:
            energies = jnp.where(mask, energies, -1e9)

        # normalization always in f32: alignment statistics accumulate over
        # hundreds of steps and feed the location features
        energies = energies.astype(jnp.float32)
        if self.norm == "softmax":
            alignment = jax.nn.softmax(energies, axis=-1)
        else:  # sigmoid norm (common_layers.py:347-354)
            sig = jax.nn.sigmoid(energies)
            alignment = sig / (sig.sum(axis=-1, keepdims=True) + 1e-8)

        new_state = dict(state)
        # location stats accumulate the PRE-forward-attention alignment
        # (≙ update_location_attention before apply_forward_attention,
        # common_layers.py:356-361)
        new_state["attention_cum"] = state["attention_cum"] + alignment
        if self.use_forward_attn:
            alignment, new_state = self._forward_attention(alignment, new_state)
        new_state["attention_weights"] = alignment

        context = jnp.einsum("bt,btd->bd", alignment.astype(inputs.dtype),
                             inputs)
        if self.use_transition_agent:
            ta_input = jnp.concatenate([context, query], axis=-1)
            new_state["u"] = jax.nn.sigmoid(self.ta(ta_input))
        return context, new_state

    def _forward_attention(self, alignment: Array, state: State) -> Tuple[Array, State]:
        """alpha_t ∝ ((1-u) α_{t-1} + u shift(α_{t-1}) + eps) * align
        (≙ apply_forward_attention, common_layers.py:301-323)."""
        alpha = state["alpha"]
        u = state["u"] if self.use_transition_agent else 0.5
        shifted = jnp.pad(alpha, ((0, 0), (1, 0)))[:, :-1]
        alpha_new = ((1.0 - u) * alpha + u * shifted + 1e-8) * alignment
        if self.forward_attn_mask:
            # zero-out positions beyond the first peak's prefix
            # (common_layers.py:305-314): keep fwd probability mass causal
            fwd_shifted = jnp.pad(alpha, ((0, 0), (0, 1)), constant_values=0.0)[:, 1:]
            val = jnp.maximum(fwd_shifted, alpha)
            peak = jnp.argmax(val, axis=-1, keepdims=True)
            pos = jnp.arange(alpha.shape[-1])[None, :]
            keep = pos <= peak + 1
            alpha_new = jnp.where(keep, alpha_new, 0.0)
            alpha_new = alpha_new + 1e-7 * (1.0 - keep)
        alpha_new = alpha_new / (alpha_new.sum(axis=-1, keepdims=True) + 1e-8)
        new_state = dict(state)
        new_state["alpha"] = alpha_new
        return alpha_new, new_state


class GravesAttention(nn.Module):
    """Discretized GMM attention (GMMv2b, ≙ common_layers.py:113-193)."""

    K: int = 5
    query_dim: int = 1024

    COEF = 0.3989422917366028  # 1/sqrt(2*pi)

    def setup(self):
        self.N_a = [
            nn.Dense(self.query_dim, name="N_a_hidden"),
            nn.Dense(3 * self.K, name="N_a_out"),
        ]

    def init_state(self, batch: int, t_in: int) -> State:
        return {
            "mu_prev": jnp.zeros((batch, self.K)),
            "attention_weights": jnp.zeros((batch, t_in)),
        }

    def preprocess_inputs(self, inputs: Array) -> Optional[Array]:
        return None

    def __call__(
        self,
        query: Array,
        inputs: Array,
        processed_inputs: Optional[Array],
        state: State,
        mask: Optional[Array] = None,
        use_windowing: bool = False,
    ) -> Tuple[Array, State]:
        t_in = inputs.shape[1]
        h = jax.nn.relu(self.N_a[0](query))
        gbk = self.N_a[1](h)
        g_t, b_t, k_t = jnp.split(gbk, 3, axis=-1)

        g_t = jax.nn.softmax(g_t, axis=-1) + 1e-7  # mixture weights
        sig_t = jax.nn.softplus(b_t) + 1e-7        # scales
        mu_t = state["mu_prev"] + jax.nn.softplus(k_t)  # monotonic means

        j = jnp.arange(t_in + 1, dtype=jnp.float32)[None, None, :]
        # discretized location: CDF F(j) = sum_k g_k * sigmoid((j - mu_k)/sig_k)
        # is increasing in j; mass at position j is F(j+1) - F(j)
        phi_t = g_t[..., None] * jax.nn.sigmoid(
            (j - mu_t[..., None]) / sig_t[..., None])
        cdf = jnp.sum(phi_t, axis=1)
        alpha_t = cdf[:, 1:] - cdf[:, :-1]
        alpha_t = jnp.maximum(alpha_t, 1e-8)

        if mask is not None:
            alpha_t = jnp.where(mask, alpha_t, 0.0)

        context = jnp.einsum("bt,btd->bd", alpha_t.astype(inputs.dtype),
                             inputs)
        new_state = {"mu_prev": mu_t, "attention_weights": alpha_t}
        return context, new_state


def init_attn(
    attn_type: str,
    *,
    attn_dim: int = 128,
    query_dim: int = 1024,
    location_attention: bool = True,
    attn_K: int = 5,
    use_forward_attn: bool = False,
    use_transition_agent: bool = False,
    forward_attn_mask: bool = False,
    norm: str = "softmax",
    windowing: bool = False,
    use_v_bias: bool = False,
    name: str = "attention",
):
    """Attention factory (≙ init_attn, common_layers.py:375-389)."""
    if attn_type == "graves":
        return GravesAttention(K=attn_K, query_dim=query_dim, name=name)
    if attn_type == "original":
        return LocationSensitiveAttention(
            attn_dim=attn_dim,
            use_v_bias=use_v_bias,
            use_location=location_attention,
            use_forward_attn=use_forward_attn,
            use_transition_agent=use_transition_agent,
            forward_attn_mask=forward_attn_mask,
            norm=norm,
            windowing=windowing,
            name=name,
        )
    raise ValueError(f"unknown attention type: {attn_type}")
