"""Multi-device tests on a virtual 8-device CPU mesh — coverage the reference
never had (its distributed code was untested; SURVEY.md §4 'fixtures/mocks')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.parallel import make_dp_train_step, make_mesh, replicate
from tts_tpu.parallel.data_parallel import shard_batch
from tts_tpu.train.optim import make_optimizer
from tts_tpu.train.state import create_train_state, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh((("data", -1),))


def _batch(rng, B=8, T_text=12, T_mel=16, r=2):
    k1, k2 = jax.random.split(rng)
    return {
        "text": jax.random.randint(k1, (B, T_text), 0, 50),
        "text_lengths": jnp.full((B,), T_text, jnp.int32),
        "mel": jax.random.normal(k2, (B, T_mel, 80)),
        "mel_lengths": jnp.full((B,), T_mel, jnp.int32),
        "stop_targets": jnp.zeros((B, T_mel // r)).at[:, -1].set(1.0),
    }


def test_mesh_construction(mesh):
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh((("data", 4), ("model", 2)))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_mesh_bad_shape():
    with pytest.raises(AssertionError):
        make_mesh((("data", 3),))  # 8 % 3 != 0


class TestDPTrainStep:
    def _setup(self, mesh):
        model = Tacotron2(num_chars=50, r=2, encoder_dim=32, embedding_dim=32,
                          attn_dim=16)
        rng = jax.random.PRNGKey(0)
        batch = _batch(rng)
        tx = make_optimizer(lr=1e-3, grad_clip=5.0)
        state = create_train_state(model, rng, batch, tx)
        return model, state, batch, rng

    def test_dp_step_runs(self, mesh):
        model, state, batch, rng = self._setup(mesh)
        state = replicate(state, mesh)
        sbatch = shard_batch(batch, mesh)
        step = make_dp_train_step(model, mesh)
        state, losses = step(state, sbatch, rng)
        assert np.isfinite(float(losses["loss"]))
        assert int(state.step) == 1

    def test_dp_matches_single_device(self, mesh):
        """pmean-reduced DP step EQUALS the single-device step on the same
        global batch — losses and post-step params (the correctness property
        of gradient all-reduce, ≙ reference distribute.py:75-116).

        Dropout is disabled (train=False) so both runs compute the same
        function; the batch uses uniform lengths so the per-shard masked
        means compose exactly to the global mean.
        """
        model, state, batch, rng = self._setup(mesh)

        single = make_train_step(model, jit=True, train=False)
        s1, losses1 = single(state, batch, rng)

        state_r = replicate(self._setup(mesh)[1], mesh)
        step = make_dp_train_step(model, mesh, train=False)
        s2, losses2 = step(state_r, shard_batch(batch, mesh), rng)

        np.testing.assert_allclose(float(losses1["loss"]),
                                   float(losses2["loss"]),
                                   rtol=1e-5)
        flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(s2.params))
        assert flat1 and len(flat1) == len(flat2)
        for path, leaf1 in flat1:
            np.testing.assert_allclose(
                np.asarray(leaf1), np.asarray(flat2[path]),
                atol=1e-6, rtol=1e-4,
                err_msg=f"param diverged at {jax.tree_util.keystr(path)}")

    def test_dp_multiple_steps_stay_synced(self, mesh):
        model, state, batch, rng = self._setup(mesh)
        state = replicate(state, mesh)
        step = make_dp_train_step(model, mesh)
        for i in range(3):
            state, losses = step(state, shard_batch(batch, mesh),
                                 jax.random.fold_in(rng, i))
        assert int(state.step) == 3
        # params are replicated: every shard sees the same values
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert np.isfinite(np.asarray(leaf)).all()


class TestDPGanStep:
    def test_gan_dp_step(self, mesh):
        """GAN G+D gradients pmean-reduced over the mesh (capability the
        reference's single-GPU vocoder training lacked)."""
        from tts_tpu.models.vocoder.melgan import (
            MelganGenerator, MelganMultiscaleDiscriminator)
        from tts_tpu.parallel.data_parallel import shard_batch
        from tts_tpu.train.gan import create_gan_states, make_gan_train_step
        from tts_tpu.train.optim import make_optimizer

        rng = jax.random.PRNGKey(0)
        gen = MelganGenerator(base_channels=16, num_res_blocks=1,
                              upsample_factors=(4, 4))
        disc = MelganMultiscaleDiscriminator(num_scales=2)
        batch = {
            "audio": jax.random.normal(rng, (8, 8 * 16, 1)) * 0.1,
            "mel": jax.random.normal(rng, (8, 8, 80)),
        }
        sg, sd = create_gan_states(gen, disc, batch, rng,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        sg = replicate(sg, mesh)
        sd = replicate(sd, mesh)
        step = make_gan_train_step(gen, disc, hop_len=16, conv_pad=0,
                                   train_disc=True, mesh=mesh)
        sbatch = shard_batch(batch, mesh)
        sg2, sd2, losses = step(sg, sd, sbatch, sbatch, rng)
        assert np.isfinite(float(losses["G_loss"]))
        assert np.isfinite(float(losses["D_loss"]))
        assert int(sg2.step) == 1 and int(sd2.step) == 1


class TestModelParallelVocoder:
    def test_sharded_forward_matches_replicated(self):
        """(data=4, model=2) mesh: channel-sharded MelGAN forward must equal
        the single-device result (XLA inserts the ICI collectives)."""
        from tts_tpu.models.vocoder.melgan import MelganGenerator
        from tts_tpu.parallel import make_mesh
        from tts_tpu.parallel.model_parallel import (
            channel_shardings, make_sharded_generator_forward, shard_params)

        mesh2 = make_mesh((("data", 4), ("model", 2)))
        rng = jax.random.PRNGKey(0)
        gen = MelganGenerator(base_channels=256, num_res_blocks=1,
                              upsample_factors=(4, 4))
        mel = jax.random.normal(rng, (4, 8, 80))
        v = gen.init(rng, mel)

        y_ref = np.asarray(gen.apply(v, mel))

        params = shard_params(v["params"], mesh2)
        # at least one wide kernel must actually be sharded
        specs = jax.tree_util.tree_leaves(
            channel_shardings(v["params"], mesh2))
        assert any(s.spec != jax.sharding.PartitionSpec() for s in specs)

        fwd = make_sharded_generator_forward(gen, mesh2)
        y_sharded = np.asarray(fwd(params, mel))
        np.testing.assert_allclose(y_sharded, y_ref, atol=2e-5)
