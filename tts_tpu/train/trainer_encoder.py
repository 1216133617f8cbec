"""Speaker-encoder trainer (≙ /root/reference/TTS/bin/train_encoder.py:1-274):
RAdam + GE2E/AngleProto on N x M batches, (N*M, T, D) -> (N, M, D) reshape."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from tts_tpu.audio import AudioProcessor
from tts_tpu.data import load_meta_data
from tts_tpu.data.speaker_dataset import SpeakerEncoderDataset
from tts_tpu.losses.ge2e import AngleProtoLoss, GE2ELoss
from tts_tpu.models.speaker_encoder import SpeakerEncoder
from tts_tpu.train import checkpoint as ckpt_io
from tts_tpu.train.optim import make_optimizer
from tts_tpu.utils.generic import KeepAverage
from tts_tpu.utils.loggers import ConsoleLogger, TensorboardLogger


class SpeakerEncoderTrainer:
    def __init__(self, config: Dict[str, Any], output_path: str):
        self.c = config
        self.output_path = output_path
        os.makedirs(output_path, exist_ok=True)
        self.ap = AudioProcessor(**config["audio"])

        items, _ = load_meta_data(config["datasets"], eval_split_size=0.0)
        self.dataset = SpeakerEncoderDataset(
            self.ap, items,
            voice_len_seconds=config.get("voice_len", 1.6),
            num_speakers_in_batch=config["num_speakers_in_batch"],
            num_utters_per_speaker=config["num_utters_per_speaker"],
            skip_speakers=config.get("skip_speakers", True),
            storage_size=config.get("storage", {}).get("storage_size", 8),
            sample_from_storage_p=config.get("storage", {}).get(
                "sample_from_storage_p", 0.5),
            additive_noise=config.get("storage", {}).get("additive_noise", 1e-5))

        mcfg = config.get("model", {})
        self.model = SpeakerEncoder(
            input_dim=mcfg.get("input_dim", config["audio"].get("num_mels", 40)),
            proj_dim=mcfg.get("proj_dim", 256),
            lstm_dim=mcfg.get("lstm_dim", 768),
            num_lstm_layers=mcfg.get("num_lstm_layers", 3))
        loss_name = config.get("loss", "ge2e")
        self.loss_mod = (GE2ELoss() if loss_name == "ge2e"
                         else AngleProtoLoss())
        self.tx = make_optimizer(lr=config.get("lr", 1e-4),
                                 grad_clip=config.get("grad_clip", 3.0))

        self.console = ConsoleLogger()
        self.tb = TensorboardLogger(output_path, "speaker_encoder")
        self.rng = jax.random.PRNGKey(config.get("seed", 54321))
        self.global_step = 0
        self.params = None
        self.opt_state = None
        self._step_fn = None

    def _init_state(self, mels: jnp.ndarray) -> None:
        if self.params is not None:
            return
        N = self.c["num_speakers_in_batch"]
        M = self.c["num_utters_per_speaker"]
        init_rng, self.rng = jax.random.split(self.rng)
        enc_p = self.model.init(init_rng, mels)["params"]
        emb_dim = self.model.proj_dim
        loss_p = self.loss_mod.init(
            init_rng, jnp.zeros((N, M, emb_dim)))["params"]
        self.params = {"enc": enc_p, "loss": loss_p}
        self.opt_state = self.tx.init(self.params)

    def _step(self):
        if self._step_fn is None:
            model, loss_mod, tx = self.model, self.loss_mod, self.tx
            N = self.c["num_speakers_in_batch"]
            M = self.c["num_utters_per_speaker"]

            @jax.jit
            def step(params, opt_state, mels):
                def loss_fn(p):
                    emb = model.apply({"params": p["enc"]}, mels)
                    # (N*M, D) -> (N, M, D) (≙ train_encoder.py:91-93)
                    return loss_mod.apply({"params": p["loss"]},
                                          emb.reshape(N, M, -1))
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            self._step_fn = step
        return self._step_fn

    def train(self, num_steps: int) -> Dict[str, float]:
        keep = KeepAverage()
        step_fn = None
        for _ in range(num_steps):
            batch = self.dataset.next_batch()
            mels = jnp.asarray(batch["mels"])
            self._init_state(mels)
            step_fn = step_fn or self._step()
            self.params, self.opt_state, loss = step_fn(
                self.params, self.opt_state, mels)
            keep.update_values({"avg_loss": float(loss)})
            self.global_step += 1
            self.tb.tb_train_iter_stats(self.global_step,
                                        {"loss": float(loss)})
            if self.global_step % self.c.get("save_step", 10000) == 0:
                self.save_checkpoint()
        return keep.avg_values

    def compute_embeddings(self, mels: jnp.ndarray, **kwargs) -> jnp.ndarray:
        """d-vector extraction for external-embedding TTS conditioning
        (≙ the GE2E extraction notebooks). kwargs forward to
        SpeakerEncoder.compute_embedding (num_frames, overlap)."""
        return self.model.apply({"params": self.params["enc"]}, mels,
                                method=self.model.compute_embedding, **kwargs)

    def save_checkpoint(self) -> str:
        return ckpt_io.save_checkpoint(
            self.output_path, params=self.params, opt_state=self.opt_state,
            step=self.global_step, config=self.c)
