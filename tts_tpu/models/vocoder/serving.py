"""Fused serving path for MelGAN-family generators.

A pure function over the FOLDED params tree (fold_weight_norm +
use_weight_norm=False): the proj/upsample convs run as XLA convs while
every residual stack — the HBM-traffic hot spot — runs as one Pallas kernel
with the full per-item time axis resident in VMEM
(ops/pallas/fused_resstack.py).

Layout: the stack kernel computes in (C, T) — time on lanes — so between
stages the activations stay TRANSPOSED as (B, C, T); the upsample
transposed-convs are lax.conv_transpose calls whose dimension numbers
absorb the NWC->NCW boundary conversions (no standalone transpose passes
over the ~100 MB intermediates). Numerics are element-wise identical (up to
TPU matmul precision) to ``generator.apply`` with the same params —
tests/test_fused_vocoder.py.

≙ the reference's serving path MelganGenerator.inference after
remove_weight_norm (/root/reference/TTS/vocoder/models/melgan_generator.py:
72-97) — re-architected for the TPU memory hierarchy rather than translated.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.models.vocoder.melgan import MelganGenerator, _reflect_pad_t
from tts_tpu.ops.pallas.fused_resstack import (_fused_stack_packed,
                                               stack_params_from_tree)

Array = jnp.ndarray


def _conv_transpose(x: Array, kernel: Array, bias: Array, factor: int,
                    in_layout: str, out_layout: str) -> Array:
    """flax nn.ConvTranspose(padding="SAME") semantics with configurable
    input/output layouts ("NWC" or "NCW"); kernel stays flax-shaped
    (k, in, out)."""
    y = jax.lax.conv_transpose(
        x, kernel, strides=(factor,), padding="SAME",
        dimension_numbers=(in_layout, "WIO", out_layout))
    if out_layout == "NCW":
        return y + bias[None, :, None]
    return y + bias[None, None, :]


def fused_generator_apply(gen: MelganGenerator, params: Dict[str, Any],
                          c: Array, compute_dtype=None,
                          interpret: bool = False) -> Array:
    """Forward pass of ``gen`` (any MelGAN-family generator config) from its
    folded params, with Pallas residual stacks. Returns the subband/waveform
    output before any PQMF synthesis."""
    cdt = compute_dtype or jnp.float32
    k = gen.proj_kernel
    x = _reflect_pad_t(c, (k - 1) // 2)
    x = nn.Conv(gen.base_channels, (k,), padding="VALID").apply(
        {"params": params["proj_in"]["conv"]}, x)

    ch = gen.base_channels
    layout = "NWC"
    for i, factor in enumerate(gen.upsample_factors):
        ch //= 2
        x = nn.leaky_relu(x, 0.2)
        up = params[f"upsample_{i}"]
        x = _conv_transpose(x, up["kernel"], up["bias"], factor,
                            in_layout=layout, out_layout="NCW")
        layout = "NCW"
        packed = stack_params_from_tree(params[f"resstack_{i}"],
                                        gen.num_res_blocks)
        x = _fused_stack_packed(x, *packed, compute_dtype=cdt,
                                transpose_in_kernel=False,
                                interpret=interpret)

    # measured: a standalone transpose + NWC head conv beats asking XLA to
    # consume NCW directly in the head conv (15.8k vs 16.1k audio-s/s)
    x = jnp.swapaxes(x, 1, 2)  # back to NWC for the output head
    x = nn.leaky_relu(x, 0.2)
    x = _reflect_pad_t(x, (k - 1) // 2)
    x = nn.Conv(gen.out_channels, (k,), padding="VALID").apply(
        {"params": params["proj_out"]["conv"]}, x)
    return jnp.tanh(x)


def fused_inference(gen: MelganGenerator, params: Dict[str, Any], c: Array,
                    compute_dtype=None, interpret: bool = False) -> Array:
    """Full serving entry: inference padding + fused forward + PQMF synthesis
    when the generator is multiband."""
    p = gen.inference_padding
    c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode="edge")
    out = fused_generator_apply(gen, params, c, compute_dtype=compute_dtype,
                                interpret=interpret)
    pqmf = getattr(gen, "pqmf", None)
    if pqmf is not None and gen.out_channels > 1:
        out = pqmf.synthesis(out)
    return out
