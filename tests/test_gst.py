"""GST tests (≙ reference multi-speaker/GST tacotron2 test variants)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.gst import GST, ReferenceEncoder
from tts_tpu.models.tacotron2 import Tacotron2

RNG = jax.random.PRNGKey(0)


class TestGSTLayers:
    def test_reference_encoder_shape(self):
        enc = ReferenceEncoder(num_mel=80, out_dim=64)
        mel = jax.random.normal(RNG, (2, 50, 80))
        v = enc.init(RNG, mel)
        out, _ = enc.apply(v, mel, mutable=["batch_stats"])
        assert out.shape == (2, 64)

    def test_gst_shape(self):
        gst = GST(num_mel=80, num_heads=4, num_style_tokens=10,
                  gst_embedding_dim=64)
        mel = jax.random.normal(RNG, (2, 50, 80))
        v = gst.init(RNG, mel)
        out, _ = gst.apply(v, mel, mutable=["batch_stats"])
        assert out.shape == (2, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_style_depends_on_input(self):
        gst = GST(num_mel=80, num_heads=2, num_style_tokens=4,
                  gst_embedding_dim=32)
        m1 = jax.random.normal(RNG, (1, 30, 80))
        m2 = m1 * 3.0 + 1.0
        v = gst.init(RNG, m1)
        s1, _ = gst.apply(v, m1, mutable=["batch_stats"])
        s2, _ = gst.apply(v, m2, mutable=["batch_stats"])
        assert not np.allclose(np.asarray(s1), np.asarray(s2))


class TestTacotron2WithGST:
    def test_train_forward(self):
        model = Tacotron2(num_chars=50, r=2, encoder_dim=64, embedding_dim=64,
                          attn_dim=32, use_gst=True, gst_embedding_dim=32,
                          gst_num_style_tokens=4, gst_num_heads=2)
        B, T_text, T_mel = 2, 10, 12
        text = jax.random.randint(RNG, (B, T_text), 0, 50)
        tlen = jnp.array([10, 8], jnp.int32)
        mel = jax.random.normal(RNG, (B, T_mel, 80))
        mlen = jnp.array([12, 10], jnp.int32)
        v = model.init({"params": RNG, "dropout": RNG}, text, tlen, mel, mlen)
        out, _ = model.apply(v, text, tlen, mel, mlen,
                             rngs={"dropout": RNG}, mutable=["batch_stats"])
        assert out["postnet_outputs"].shape == (B, T_mel, 80)
        assert "gst_layer" in v["params"]

    def test_inference_with_style_mel(self):
        model = Tacotron2(num_chars=50, r=2, encoder_dim=64, embedding_dim=64,
                          attn_dim=32, use_gst=True, gst_embedding_dim=32,
                          gst_num_style_tokens=4, gst_num_heads=2)
        text = jax.random.randint(RNG, (1, 10), 0, 50)
        mel = jax.random.normal(RNG, (1, 12, 80))
        v = model.init({"params": RNG, "dropout": RNG}, text,
                       jnp.array([10]), mel, jnp.array([12]))
        out = model.apply(v, text, jnp.array([10]), style_mel=mel,
                          rngs={"dropout": RNG}, method=model.inference,
                          max_decoder_steps=6, mutable=["batch_stats"])[0]
        assert out["postnet_outputs"].shape == (1, 12, 80)
