"""Tacotron2 model tests: train-step param updates, inference, attention
variants (≙ reference tests/test_tacotron2_model.py, SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.train.optim import make_optimizer
from tts_tpu.train.state import create_train_state, make_eval_step, make_train_step


def _dummy_batch(rng, B=2, T_text=16, T_mel=24, n_mels=80, r=2):
    k1, k2 = jax.random.split(rng)
    return {
        "text": jax.random.randint(k1, (B, T_text), 0, 50),
        "text_lengths": jnp.array([T_text] + [T_text - 3] * (B - 1), jnp.int32),
        "mel": jax.random.normal(k2, (B, T_mel, n_mels)),
        "mel_lengths": jnp.array([T_mel] + [T_mel - r] * (B - 1), jnp.int32),
        "stop_targets": jnp.zeros((B, T_mel // r)).at[:, -1].set(1.0),
    }


def _small_model(**kw):
    kw.setdefault("num_chars", 50)
    kw.setdefault("r", 2)
    kw.setdefault("encoder_dim", 64)
    kw.setdefault("embedding_dim", 64)
    kw.setdefault("attn_dim", 32)
    return Tacotron2(**kw)


def _count_changed(before, after):
    changed, total = 0, 0
    flat_b = jax.tree_util.tree_leaves_with_path(before)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(after))
    unchanged_names = []
    for path, b in flat_b:
        a = flat_a[path]
        total += 1
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            changed += 1
        else:
            unchanged_names.append(jax.tree_util.keystr(path))
    return changed, total, unchanged_names


def _run_steps(model, n_steps=3, loss_kwargs=None, batch_kw=None):
    rng = jax.random.PRNGKey(0)
    batch = _dummy_batch(rng, r=model.r, **(batch_kw or {}))
    tx = make_optimizer(lr=1e-2, grad_clip=5.0)
    state = create_train_state(model, rng, batch, tx)
    params_before = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    step = make_train_step(model, loss_kwargs, jit=True)
    losses = None
    for i in range(n_steps):
        state, losses = step(state, batch, jax.random.fold_in(rng, i))
    return params_before, state, losses


class TestTrainStep:
    def test_all_params_update(self):
        model = _small_model()
        before, state, losses = _run_steps(model)
        changed, total, unchanged = _count_changed(before, state.params)
        assert np.isfinite(float(losses["loss"]))
        assert changed == total, f"unchanged params: {unchanged}"

    def test_loss_components(self):
        model = _small_model()
        _, _, losses = _run_steps(model, loss_kwargs={"ga_alpha": 5.0,
                                                      "postnet_diff_spec_alpha": 0.25})
        for key in ("decoder_loss", "postnet_loss", "stopnet_loss", "ga_loss",
                    "postnet_diff_spec_loss", "loss"):
            assert key in losses and np.isfinite(float(losses[key])), key

    def test_loss_decreases(self):
        model = _small_model()
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        tx = make_optimizer(lr=5e-3, grad_clip=5.0)
        state = create_train_state(model, rng, batch, tx)
        step = make_train_step(model, jit=True)
        first = None
        for i in range(12):
            state, losses = step(state, batch, rng)
            if first is None:
                first = float(losses["decoder_loss"])
        assert float(losses["decoder_loss"]) < first

    def test_eval_step(self):
        model = _small_model()
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        state = create_train_state(model, rng, batch, make_optimizer(lr=1e-3))
        ev = make_eval_step(model, jit=True)
        losses = ev(state, batch, rng)
        assert np.isfinite(float(losses["loss"]))


class TestVariants:
    def test_graves_attention(self):
        model = _small_model(attn_type="graves")
        before, state, losses = _run_steps(model)
        changed, total, unchanged = _count_changed(before, state.params)
        assert changed == total, f"unchanged: {unchanged}"

    def test_forward_attention_with_transition(self):
        model = _small_model(use_forward_attn=True, use_transition_agent=True)
        _, _, losses = _run_steps(model)
        assert np.isfinite(float(losses["loss"]))

    def test_sigmoid_norm(self):
        model = _small_model(attn_norm="sigmoid")
        _, _, losses = _run_steps(model)
        assert np.isfinite(float(losses["loss"]))

    def test_multi_speaker(self):
        model = _small_model(num_speakers=3, speaker_embedding_dim=16)
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        batch["speaker_ids"] = jnp.array([0, 2], jnp.int32)
        tx = make_optimizer(lr=1e-2)
        state = create_train_state(model, rng, batch, tx)
        step = make_train_step(model, jit=True)
        state, losses = step(state, batch, rng)
        assert np.isfinite(float(losses["loss"]))
        assert "speaker_embedding" in state.params

    def test_ddc(self):
        model = _small_model(double_decoder_consistency=True, ddc_r=3)
        _, _, losses = _run_steps(model)
        assert "ddc_decoder_loss" in losses and "ddc_attn_loss" in losses
        assert np.isfinite(float(losses["loss"]))

    def test_bidirectional_decoder(self):
        model = _small_model(bidirectional_decoder=True)
        _, _, losses = _run_steps(model)
        assert "backward_decoder_loss" in losses
        assert np.isfinite(float(losses["loss"]))


class TestInference:
    def test_shapes_and_stop(self):
        model = _small_model()
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        state = create_train_state(model, rng, batch, make_optimizer(lr=1e-3))
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["text"], batch["text_lengths"],
            rngs={"dropout": rng}, method=model.inference, max_decoder_steps=10)
        assert out["postnet_outputs"].shape == (2, 20, 80)
        assert out["alignments"].shape[1] == 10
        assert (out["mel_lengths"] <= 20).all()

    def test_inference_jits(self):
        model = _small_model()
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        state = create_train_state(model, rng, batch, make_optimizer(lr=1e-3))

        @jax.jit
        def infer(params, batch_stats, text, text_lengths):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               text, text_lengths, rngs={"dropout": rng},
                               method=model.inference, max_decoder_steps=8)

        out = infer(state.params, state.batch_stats, batch["text"],
                    batch["text_lengths"])
        assert np.isfinite(np.asarray(out["postnet_outputs"])).all()


class TestTruncatedInference:
    def test_state_threading(self):
        """Streaming decode: RNN state carries across chunks
        (≙ inference_truncated, reference models/tacotron2.py:165-189)."""
        model = _small_model()
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        state = create_train_state(model, rng, batch, make_optimizer(lr=1e-3))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        out1 = model.apply(variables, batch["text"], batch["text_lengths"],
                           rngs={"dropout": rng},
                           method=model.inference_truncated,
                           max_decoder_steps=4)
        assert "decoder_state" in out1
        out2 = model.apply(variables, batch["text"], batch["text_lengths"],
                           decoder_state=out1["decoder_state"],
                           rngs={"dropout": rng},
                           method=model.inference_truncated,
                           max_decoder_steps=4)
        assert out2["postnet_outputs"].shape == out1["postnet_outputs"].shape
        # carried state changes the decode (continuation, not a restart)
        assert not np.allclose(np.asarray(out1["decoder_outputs"]),
                               np.asarray(out2["decoder_outputs"]))


class TestMixedPrecision:
    def test_bf16_forward_trains(self):
        """bf16 compute with f32 master params: finite loss, params update
        (≙ apex AMP capability, reference train_tts.py:553-559)."""
        model = _small_model()
        rng = jax.random.PRNGKey(0)
        batch = _dummy_batch(rng, r=2)
        state = create_train_state(model, rng, batch,
                                   make_optimizer(lr=1e-2, grad_clip=5.0))
        step = make_train_step(model, jit=True, mixed_precision=True)
        before = jax.tree_util.tree_map(np.asarray, state.params)
        for i in range(2):
            state, losses = step(state, batch, jax.random.fold_in(rng, i))
        assert np.isfinite(float(losses["loss"]))
        # master params stay f32
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        flat_a = dict(jax.tree_util.tree_leaves_with_path(state.params))
        changed = sum(
            not np.array_equal(a, np.asarray(flat_a[p]))
            for p, a in jax.tree_util.tree_leaves_with_path(before))
        assert changed > 0
