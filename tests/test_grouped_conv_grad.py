"""Pallas grouped-conv weight-gradient kernel (ops/pallas/grouped_conv_grad)
vs XLA autodiff — exactness at the MelGAN discriminator geometries
(≙ /root/reference/TTS/vocoder/models/melgan_discriminator.py:28-57) and
through the full discriminator with conv_lowering="pallas_wgrad"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.ops.pallas.grouped_conv_grad import (_conv_impl,
                                                  grouped_conv_pallas_wgrad,
                                                  grouped_conv_wgrad)

GEOMS = [
    # (B, L, cin, cout, k, stride, groups) — shrunk discriminator shapes
    (4, 256, 16, 64, 41, 4, 16),
    (4, 256, 64, 256, 41, 4, 64),
    (2, 64, 64, 64, 41, 4, 16),     # m=4 (down_3-like)
    (3, 128, 16, 32, 21, 4, 8),     # odd batch, k=21
]


class TestWgradKernel:
    @pytest.mark.parametrize("geom", GEOMS)
    def test_matches_autodiff(self, geom):
        B, L, cin, cout, k, s, g = geom
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (B, L, cin))
        w = jax.random.normal(rng, (k, cin // g, cout)) * 0.1
        dy = jax.random.normal(rng, _conv_impl(x, w, s, g).shape)
        ref = jax.grad(lambda w: (_conv_impl(x, w, s, g) * dy).sum())(w)
        got = grouped_conv_wgrad(x, dy, k, s, g, block_b=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-5)

    def test_custom_vjp_full_grads(self):
        B, L, cin, cout, k, s, g = GEOMS[0]
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (B, L, cin))
        w = jax.random.normal(rng, (k, cin // g, cout)) * 0.1

        def loss(fn, x, w):
            return (fn(x, w) ** 2).sum()

        gx1, gw1 = jax.grad(
            lambda x, w: loss(lambda x, w: _conv_impl(x, w, s, g), x, w),
            argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(
            lambda x, w: loss(
                lambda x, w: grouped_conv_pallas_wgrad(x, w, s, g), x, w),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                                   atol=2e-4, rtol=1e-5)


class TestDiscriminatorLowering:
    def test_pallas_wgrad_matches_conv(self):
        """Full MelganDiscriminator: grads under conv_lowering='pallas_wgrad'
        must match the plain XLA conv lowering (same params: the
        GroupedStridedConv param tree interchanges with nn.Conv)."""
        from tts_tpu.models.vocoder.melgan import MelganDiscriminator

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 1024, 1))
        d_conv = MelganDiscriminator(conv_lowering="conv")
        d_pall = MelganDiscriminator(conv_lowering="pallas_wgrad")
        params = d_conv.init(rng, x)["params"]

        def loss(d, p, x):
            score, feats = d.apply({"params": p}, x)
            return (score ** 2).sum() + sum((f ** 2).mean() for f in feats)

        l1 = float(loss(d_conv, params, x))
        l2 = float(loss(d_pall, params, x))
        assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))

        g1 = jax.grad(lambda p: loss(d_conv, p, x))(params)
        g2 = jax.grad(lambda p: loss(d_pall, p, x))(params)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = {jax.tree_util.keystr(kp): v
                 for kp, v in jax.tree_util.tree_leaves_with_path(g2)}
        for kp, v1 in flat1:
            v2 = flat2[jax.tree_util.keystr(kp)]
            np.testing.assert_allclose(
                np.asarray(v2), np.asarray(v1), atol=5e-4, rtol=1e-4,
                err_msg=jax.tree_util.keystr(kp))
