"""Glow-TTS tests: flow invertibility, DDI, train-step updates, inference
(≙ reference tests/test_glow_tts.py:31-130)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tts_tpu.models.glow.decoder import FlowDecoder, squeeze, unsqueeze
from tts_tpu.models.glow.flows import ActNorm, CouplingBlock, InvConvNear
from tts_tpu.models.glow_tts import GlowTTS, apply_ddi, glow_tts_loss
from tts_tpu.train.optim import make_optimizer

RNG = jax.random.PRNGKey(0)


def _small_model(**kw):
    kw.setdefault("num_chars", 50)
    kw.setdefault("hidden_channels_enc", 64)
    kw.setdefault("hidden_channels_dec", 64)
    kw.setdefault("filter_channels", 128)
    kw.setdefault("filter_channels_dp", 64)
    kw.setdefault("num_layers_enc", 2)
    kw.setdefault("num_flow_blocks_dec", 3)
    return GlowTTS(**kw)


def _batch(B=2, T_x=12, T_y=40):
    k1, k2 = jax.random.split(RNG)
    return {
        "text": jax.random.randint(k1, (B, T_x), 0, 50),
        "text_lengths": jnp.array([T_x, T_x - 3][:B], jnp.int32),
        "mel": jax.random.normal(k2, (B, T_y, 80)),
        "mel_lengths": jnp.array([T_y, T_y - 10][:B], jnp.int32),
    }


class TestFlowBlocks:
    def test_actnorm_invertible(self):
        x = jax.random.normal(RNG, (2, 10, 8))
        mask = jnp.ones((2, 10, 1))
        layer = ActNorm(channels=8)
        p = layer.init(RNG, x, mask)
        z, logdet = layer.apply(p, x, mask)
        x2, _ = layer.apply(p, z, mask, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
        assert logdet.shape == (2,)

    def test_invconv_invertible(self):
        x = jax.random.normal(RNG, (2, 10, 8))
        mask = jnp.ones((2, 10, 1))
        layer = InvConvNear(channels=8, n_split=4)
        p = layer.init(RNG, x, mask)
        z, logdet = layer.apply(p, x, mask)
        assert not np.allclose(np.asarray(z), np.asarray(x))
        x2, _ = layer.apply(p, z, mask, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    def test_coupling_invertible(self):
        x = jax.random.normal(RNG, (2, 10, 8))
        mask = jnp.ones((2, 10, 1))
        layer = CouplingBlock(in_channels=8, hidden_channels=16, num_layers=2)
        p = layer.init(RNG, x, mask)
        z, logdet = layer.apply(p, x, mask, train=False)
        x2, _ = layer.apply(p, z, mask, reverse=True, train=False)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    def test_squeeze_roundtrip(self):
        x = jax.random.normal(RNG, (2, 10, 8))
        mask = jnp.ones((2, 10, 1))
        z, zmask = squeeze(x, mask, 2)
        assert z.shape == (2, 5, 16)
        x2, _ = unsqueeze(z, zmask, 2)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)

    def test_decoder_invertible(self):
        x = jax.random.normal(RNG, (2, 20, 8))
        mask = jnp.ones((2, 20, 1))
        dec = FlowDecoder(in_channels=8, hidden_channels=16,
                          num_flow_blocks=3, num_coupling_layers=2)
        p = dec.init(RNG, x, mask, train=False)
        z, logdet, zmask = dec.apply(p, x, mask, train=False)
        assert np.isfinite(np.asarray(logdet)).all()
        x2, _, _ = dec.apply(p, z, zmask, reverse=True, train=False)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


class TestGlowTTSModel:
    def test_forward_shapes(self):
        model = _small_model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        out = model.apply(v, b["text"], b["text_lengths"], b["mel"],
                          b["mel_lengths"], rngs={"dropout": RNG})
        assert out["z"].shape == (2, 40, 80)
        assert out["alignments"].shape == (2, 40, 12)
        # alignment: each valid frame attends exactly one token
        align = np.asarray(out["alignments"])
        assert np.allclose(align[0].sum(-1), 1.0)

    def test_decode_mean_reconstruction(self):
        """decode_mean (bin/eval_model's flow-family teacher forcing) is the
        decoder's exact inverse: pushing its mel reconstruction back through
        the forward flow returns the MAS-aligned latent means."""
        from tts_tpu.models.glow_tts import GlowTTS

        model = _small_model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        out = model.apply(v, b["text"], b["text_lengths"], b["mel"],
                          b["mel_lengths"], train=False,
                          rngs={"dropout": RNG})
        mel_hat = model.apply(v, out["y_mean"], out["y_mask"],
                              method=GlowTTS.decode_mean)
        assert mel_hat.shape == out["z"].shape
        assert np.isfinite(np.asarray(mel_hat)).all()
        z_back, _, _ = model.apply(
            v, mel_hat, out["y_mask"],
            method=lambda m, y, mask: m.decoder(y, mask, reverse=False,
                                                train=False))
        want = np.asarray(out["y_mean"] * out["y_mask"])
        np.testing.assert_allclose(np.asarray(z_back * out["y_mask"]),
                                   want, atol=1e-4)

    def test_train_step_updates_params(self):
        model = _small_model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        # adam (not radam): its sqrt(v) normalization gives ~lr-sized updates
        # even for the ~1e-8 warm-up grads behind the zero-init 'end' convs,
        # so the all-params-changed assertion is meaningful after 5 steps
        tx = optax.adam(1e-3)
        opt_state = tx.init(v["params"])

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                out = model.apply({"params": p}, b["text"], b["text_lengths"],
                                  b["mel"], b["mel_lengths"],
                                  rngs={"dropout": rng})
                return glow_tts_loss(out, b["text_lengths"])["loss"]
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params = v["params"]
        before = jax.tree_util.tree_map(np.asarray, params)
        losses = []
        for i in range(5):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.fold_in(RNG, i))
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]  # MLE improves on a fixed batch
        flat_b = jax.tree_util.tree_leaves_with_path(before)
        flat_a = dict(jax.tree_util.tree_leaves_with_path(params))
        unchanged = [jax.tree_util.keystr(p) for p, a in flat_b
                     if np.array_equal(a, np.asarray(flat_a[p]))]
        assert not unchanged, f"unchanged params: {unchanged}"

    def test_ddi_normalizes_latents(self):
        model = _small_model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        v2 = apply_ddi(model, v, b, RNG)
        # actnorm params are no longer zero
        an = v2["params"]["decoder"]["actnorm_0"]
        assert np.abs(np.asarray(an["logs"])).sum() > 0
        assert np.abs(np.asarray(an["bias"])).sum() > 0

    def test_inference(self):
        model = _small_model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        out = model.apply(v, b["text"], b["text_lengths"],
                          rngs={"dropout": RNG, "noise": RNG},
                          method=model.inference, y_max_length=64)
        assert out["model_outputs"].shape == (2, 64, 80)
        assert (out["mel_lengths"] > 0).all()
        assert (out["mel_lengths"] <= 64).all()
        assert np.isfinite(np.asarray(out["model_outputs"])).all()

    def test_inference_jits(self):
        model = _small_model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])

        @jax.jit
        def infer(params, text, tlen):
            return model.apply({"params": params}, text, tlen,
                               rngs={"dropout": RNG, "noise": RNG},
                               method=model.inference, y_max_length=64)

        out = infer(v["params"], b["text"], b["text_lengths"])
        assert np.isfinite(np.asarray(out["model_outputs"])).all()

    def test_multi_speaker(self):
        model = _small_model(num_speakers=3)
        b = _batch()
        sid = jnp.array([0, 2], jnp.int32)
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"],
                       speaker_ids=sid)
        out = model.apply(v, b["text"], b["text_lengths"], b["mel"],
                          b["mel_lengths"], speaker_ids=sid,
                          rngs={"dropout": RNG})
        assert np.isfinite(float(glow_tts_loss(out, b["text_lengths"])["loss"]))
        assert "emb_g" in v["params"]

    @pytest.mark.parametrize("enc", ["gatedconv", "time-depth-separable"])
    def test_alt_encoders(self, enc):
        model = _small_model(encoder_type=enc, use_encoder_prenet=False)
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        # TDS carries BatchNorm running stats — mutable in train mode
        out, _ = model.apply(v, b["text"], b["text_lengths"], b["mel"],
                             b["mel_lengths"], rngs={"dropout": RNG},
                             mutable=["batch_stats"])
        assert np.isfinite(float(glow_tts_loss(out, b["text_lengths"])["loss"]))


class TestTransformerMasking:
    def test_attn_mask_broadcast_batch_neq_heads(self):
        """Regression: attention mask must be (B,1,T,T); a broadcast bug made
        it (B,B,1,T), which only 'worked' when B == num_heads."""
        from tts_tpu.models.glow.transformer import RelPosTransformer

        B, T, C = 5, 12, 32  # B != num_heads
        x = jax.random.normal(RNG, (B, T, C))
        x_mask = jnp.ones((B, T, 1)).at[:, 8:].set(0.0)
        tr = RelPosTransformer(hidden_channels=C, filter_channels=64,
                               num_heads=2, num_layers=1)
        v = tr.init({"params": RNG, "dropout": RNG}, x, x_mask, train=False)
        out = tr.apply(v, x, x_mask, train=False)
        assert out.shape == (B, T, C)
        assert np.isfinite(np.asarray(out)).all()
        # masked positions produce zeros (mask multiplied at output)
        assert np.allclose(np.asarray(out)[:, 8:], 0.0)

    def test_masked_positions_dont_influence(self):
        from tts_tpu.models.glow.transformer import RelPosTransformer

        B, T, C = 3, 10, 16
        x = jax.random.normal(RNG, (B, T, C))
        x_mask = jnp.ones((B, T, 1)).at[:, 6:].set(0.0)
        tr = RelPosTransformer(hidden_channels=C, filter_channels=32,
                               num_heads=4, num_layers=1, kernel_size=1)
        v = tr.init({"params": RNG, "dropout": RNG}, x, x_mask, train=False)
        out1 = tr.apply(v, x, x_mask, train=False)
        # change padded content -> valid outputs must not change
        x2 = x.at[:, 6:].set(99.0)
        out2 = tr.apply(v, x2, x_mask, train=False)
        np.testing.assert_allclose(np.asarray(out1)[:, :6],
                                   np.asarray(out2)[:, :6], atol=1e-5)
