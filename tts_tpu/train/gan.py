"""GAN vocoder training: alternating G/D jitted steps with D warmup.

Capability parity with the reference GAN trainer loop
(/root/reference/TTS/bin/train_vocoder.py:83-281): generator pass + multi-scale
STFT (+ subband) losses, adversarial + feature-matching terms once the
discriminator starts (``steps_to_start_discriminator``), discriminator pass on
a *separate* random batch, two optimizers. Re-designed for XLA: the warmup
switch selects between two compiled step functions in Python (static branch,
no lax.cond over the whole graph); each step is one fused program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax.training import train_state

from tts_tpu.losses.vocoder_losses import discriminator_loss, generator_loss


class GState(train_state.TrainState):
    pass


def _as_lists(d_out):
    """Normalize discriminator outputs to (scores: list, feats: list|None)."""
    if isinstance(d_out, tuple):
        scores, feats = d_out
    else:
        scores, feats = d_out, None
    if not isinstance(scores, (list, tuple)):
        scores = [scores]
    if feats is not None and feats and not isinstance(feats[0], (list, tuple)):
        feats = [feats]
    return list(scores), (list(feats) if feats else None)


def _gen_forward(gen, params, batch, rng, hop_len: int, conv_pad: int,
                 use_pqmf: bool, needs_noise: bool = False):
    """Run the generator; returns (full-band y_hat trimmed to target length,
    subband y_hat or None)."""
    mel = batch["mel"]
    T_audio = batch["audio"].shape[1]
    if needs_noise:
        # ParallelWaveGAN: white-noise input at audio rate (z ~ N(0, I))
        noise = jax.random.normal(rng, (mel.shape[0], T_audio, 1))
        y_hat = gen.apply({"params": params}, noise, mel)
        y_sub = None
    else:
        y_hat = gen.apply({"params": params}, mel)
        y_sub = None
        if use_pqmf:
            y_sub = y_hat
            y_hat = gen.pqmf.synthesis(y_hat)
    # conv_pad context frames make the output longer; take the center
    offset = conv_pad * hop_len
    if y_hat.shape[1] > T_audio:
        y_hat = jax.lax.dynamic_slice_in_dim(y_hat, offset, T_audio, 1)
    return y_hat, y_sub


def make_gan_train_step(
    gen,
    disc,
    *,
    hop_len: int = 256,
    conv_pad: int = 2,
    use_pqmf: bool = False,
    needs_noise: bool = False,
    disc_takes_cond: bool = False,
    train_disc: bool = True,
    gen_loss_kwargs: Optional[Dict] = None,
    disc_loss_kwargs: Optional[Dict] = None,
    jit: bool = True,
    mesh=None,
    axis: str = "data",
    mixed_precision: bool = False,
) -> Callable:
    """Returns step(state_G, state_D, batch_G, batch_D, rng) ->
    (state_G, state_D, losses). Build twice (train_disc=False for warmup).

    With ``mesh``, the step runs SPMD over the mesh's data axis: per-shard
    G and D grads are pmean-reduced over ICI before the optimizer updates —
    the GAN data parallelism the reference never had (its vocoder training is
    single-GPU; SURVEY.md §3.3 'TPU build must add DP for GAN training').

    mixed_precision: run the G and D forwards in bfloat16 (params cast at
    the step boundary — f32 masters stay in the optimizer; STFT/adversarial
    losses and gradients are f32). Same recipe as make_train_step's AMP
    equivalent; the step is weight/activation-HBM-traffic-bound
    (profile_gan_step.py), which bf16 halves."""
    gkw = dict(gen_loss_kwargs or {})
    dkw = dict(disc_loss_kwargs or {})
    if use_pqmf:
        gkw.setdefault("use_subband_stft_loss", True)

    from tts_tpu.train.state import _cast_floats

    def _mp(tree):
        return _cast_floats(tree, jnp.bfloat16) if mixed_precision else tree

    def _f32(tree):
        return _cast_floats(tree, jnp.float32) if mixed_precision else tree

    def _disc_apply(params, y, cond, rng):
        kwargs = {}
        if disc_takes_cond:
            out = disc.apply({"params": params}, _mp(y), _mp(cond), rng=rng)
        else:
            out = disc.apply({"params": params}, _mp(y))
        scores, feats = _as_lists(out)
        return _f32(scores), _f32(feats)

    def step(state_G: GState, state_D: GState, batch_G: Dict, batch_D: Dict,
             rng) -> Tuple[GState, GState, Dict]:
        base = jax.random.fold_in(rng, state_G.step)
        if mesh is not None:
            base = jax.random.fold_in(base, jax.lax.axis_index(axis))
        rng_g, rng_d1, rng_d2 = jax.random.split(base, 3)

        # ---- generator update ----
        d_params_mp = _mp(state_D.params) if train_disc else None

        def g_loss_fn(g_params):
            b_G = dict(batch_G, mel=_mp(batch_G["mel"]))
            y_hat, y_hat_sub = _gen_forward(gen, _mp(g_params), b_G, rng_g,
                                            hop_len, conv_pad, use_pqmf,
                                            needs_noise)
            y_hat, y_hat_sub = _f32(y_hat), _f32(y_hat_sub)
            y_G = batch_G["audio"]
            kwargs = dict(gkw)
            if use_pqmf and y_hat_sub is not None:
                kwargs["y_hat_sub"] = y_hat_sub
                kwargs["y_sub"] = gen.pqmf.analysis(y_G)
            if train_disc:
                scores_fake, feats_fake = _disc_apply(d_params_mp, y_hat,
                                                      batch_G["mel"], rng_d1)
                feats_real = None
                if kwargs.get("use_feat_match_loss"):
                    _, feats_real = _disc_apply(d_params_mp, y_G,
                                                batch_G["mel"], rng_d1)
                kwargs["scores_fake"] = scores_fake
                kwargs["feats_fake"] = feats_fake
                kwargs["feats_real"] = feats_real
            losses = generator_loss(y_hat, y_G, **kwargs)
            return losses["G_loss"], losses

        g_grads, g_losses = jax.grad(g_loss_fn, has_aux=True)(state_G.params)
        if mesh is not None:
            g_grads = jax.lax.pmean(g_grads, axis)
            g_losses = jax.lax.pmean(g_losses, axis)
        new_G = state_G.apply_gradients(grads=g_grads)

        losses = dict(g_losses)

        # ---- discriminator update (separate batch; G frozen) ----
        if train_disc:
            b_D = dict(batch_D, mel=_mp(batch_D["mel"]))
            y_hat_D, _ = _gen_forward(gen,
                                      _mp(jax.lax.stop_gradient(new_G.params)),
                                      b_D, rng_d2, hop_len, conv_pad,
                                      use_pqmf, needs_noise)
            y_hat_D = jax.lax.stop_gradient(y_hat_D)

            def d_loss_fn(d_params):
                scores_fake, _ = _disc_apply(_mp(d_params), y_hat_D,
                                             batch_D["mel"], rng_d2)
                scores_real, _ = _disc_apply(_mp(d_params), batch_D["audio"],
                                             batch_D["mel"], rng_d2)
                dl = discriminator_loss(scores_fake, scores_real, **dkw)
                return dl["D_loss"], dl

            d_grads, d_losses = jax.grad(d_loss_fn, has_aux=True)(state_D.params)
            if mesh is not None:
                d_grads = jax.lax.pmean(d_grads, axis)
                d_losses = jax.lax.pmean(d_losses, axis)
            new_D = state_D.apply_gradients(grads=d_grads)
            losses.update(d_losses)
        else:
            new_D = state_D

        return new_G, new_D, losses

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        rep, sh = P(), P(axis)
        smapped = shard_map(
            step, mesh=mesh,
            in_specs=(rep, rep, sh, sh, rep),
            out_specs=(rep, rep, rep),
            check_vma=False)
        return jax.jit(smapped, donate_argnums=(0, 1)) if jit else smapped
    return jax.jit(step, donate_argnums=(0, 1)) if jit else step


def create_gan_states(gen, disc, batch: Dict, rng, tx_G, tx_D,
                      disc_takes_cond: bool = False,
                      needs_noise: bool = False) -> Tuple[GState, GState]:
    mel = jnp.asarray(batch["mel"])
    y0 = jnp.asarray(batch["audio"])
    if needs_noise:
        noise = jax.random.normal(rng, (mel.shape[0], y0.shape[1], 1))
        g_vars = gen.init(rng, noise, mel)
    else:
        g_vars = gen.init(rng, mel)
    if disc_takes_cond:
        d_vars = disc.init(rng, y0, mel, rng=rng)
    else:
        d_vars = disc.init(rng, y0)
    state_G = GState.create(apply_fn=gen.apply, params=g_vars["params"], tx=tx_G)
    state_D = GState.create(apply_fn=disc.apply, params=d_vars["params"], tx=tx_D)
    return state_G, state_D
