"""Glow-TTS trainer (≙ /root/reference/TTS/bin/train_glow_tts.py).

Same orchestration as TTSTrainer with the Glow specifics: data-dependent
ActNorm init on the first batch (train_glow_tts.py:129-143), MLE + duration
loss, and no stop targets / reduction factor.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tts_tpu.audio import AudioProcessor
from tts_tpu.data import TTSDataset, load_meta_data
from tts_tpu.data.formatters import get_speakers
from tts_tpu.models.glow_tts import GlowTTS, apply_ddi, glow_tts_loss
from tts_tpu.text import num_symbols
from tts_tpu.train import checkpoint as ckpt_io
from tts_tpu.train.optim import make_optimizer
from tts_tpu.utils.generic import KeepAverage
from tts_tpu.utils.loggers import ConsoleLogger, TensorboardLogger


class GlowTTSTrainer:
    def __init__(self, config: Dict[str, Any], output_path: str, mesh=None):
        """``mesh``/``use_data_parallel``: run the train step SPMD over a
        'data' mesh (parallel.make_glow_dp_train_step — MAS in-graph per
        shard, grads/losses pmean'd). DDI stays pre-replication on the
        first global batch, matching the reference's pre-DDP
        data_depended_init + rank-0 broadcast
        (train_glow_tts.py:129-143, distribute.py:78-81)."""
        self.c = config
        self.output_path = output_path
        os.makedirs(output_path, exist_ok=True)
        self.mesh = mesh
        if mesh is None and config.get("use_data_parallel", False):
            from tts_tpu.parallel import make_mesh
            self.mesh = make_mesh((("data", -1),))
        self.ap = AudioProcessor(**config["audio"])
        self.meta_train, self.meta_eval = load_meta_data(config["datasets"])

        self.num_speakers = 1
        self.speaker_mapping = None
        if config.get("use_speaker_embedding", False):
            speakers = get_speakers(self.meta_train)
            self.speaker_mapping = {s: i for i, s in enumerate(speakers)}
            self.num_speakers = len(speakers)

        num_chars = num_symbols(config.get("use_phonemes", False))
        mas_impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
        self.model = GlowTTS(
            num_chars=num_chars,
            num_speakers=self.num_speakers,
            out_channels=config["audio"].get("num_mels", 80),
            encoder_type=config.get("encoder_type", "transformer"),
            mas_impl=mas_impl)
        self.tx = make_optimizer(
            lr=config.get("lr", 1e-3),
            grad_clip=config.get("grad_clip", 5.0),
            weight_decay=config.get("wd", 0.0),
            use_noam=config.get("noam_schedule", True),
            warmup_steps=config.get("warmup_steps", 4000))

        self.console = ConsoleLogger()
        self.tb = TensorboardLogger(output_path, "glow_tts")
        self.rng = jax.random.PRNGKey(config.get("seed", 54321))
        self.global_step = 0
        self.epoch = 0
        self.best_loss = float("inf")
        self.params = None
        self.opt_state = None
        self._step_fn = None
        self._datasets: Dict[Any, TTSDataset] = {}

    def _dataset(self, is_eval: bool) -> TTSDataset:
        if is_eval not in self._datasets:
            self._datasets[is_eval] = self._build_dataset(is_eval)
        return self._datasets[is_eval]

    def _build_dataset(self, is_eval: bool) -> TTSDataset:
        c = self.c
        return TTSDataset(
            self.ap, self.meta_eval if is_eval else self.meta_train,
            outputs_per_step=self.model.num_sqz,
            text_cleaner=c.get("text_cleaner", "english_cleaners"),
            use_phonemes=c.get("use_phonemes", False),
            phoneme_cache_path=c.get("phoneme_cache_path"),
            phoneme_language=c.get("phoneme_language", "en-us"),
            enable_eos_bos=c.get("enable_eos_bos_chars", False),
            speaker_id_mapping=self.speaker_mapping,
            min_seq_len=0 if is_eval else c.get("min_seq_len", 0),
            max_seq_len=float("inf") if is_eval
            else c.get("max_seq_len", float("inf")),
            cache_features=c.get("cache_features", False))

    def _init_state(self, batch: Dict) -> None:
        if self.params is not None:
            return
        init_rng, ddi_rng, self.rng = jax.random.split(self.rng, 3)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng},
            batch["text"], batch["text_lengths"], batch["mel"],
            batch["mel_lengths"], speaker_ids=batch.get("speaker_ids"))
        # data-dependent ActNorm init on the first batch
        variables = apply_ddi(self.model, variables, batch, ddi_rng)
        self.params = variables["params"]
        self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            from tts_tpu.parallel import replicate
            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)

    def _step(self):
        if self._step_fn is None:
            model, tx = self.model, self.tx
            if self.mesh is not None:
                from tts_tpu.parallel import make_glow_dp_train_step
                self._step_fn = make_glow_dp_train_step(model, tx, self.mesh)
                return self._step_fn

            import optax

            @jax.jit
            def step(params, opt_state, batch, rng):
                def loss_fn(p):
                    out = model.apply(
                        {"params": p}, batch["text"], batch["text_lengths"],
                        batch["mel"], batch["mel_lengths"],
                        speaker_ids=batch.get("speaker_ids"),
                        rngs={"dropout": rng})
                    losses = glow_tts_loss(out, batch["text_lengths"])
                    return losses["loss"], losses
                grads, losses = jax.grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, losses

            self._step_fn = step
        return self._step_fn

    def train_epoch(self) -> Dict[str, float]:
        from tts_tpu.utils.generic import StepTimer
        c = self.c
        ds = self._dataset(is_eval=False)
        keep = KeepAverage()
        step_fn = self._step()
        timer = StepTimer()
        for batch in ds.batches(c.get("batch_size", 32), shuffle=True,
                                seed=self.epoch):
            loader_time = timer.lap()
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k != "item_idxs"}
            self._init_state(jb)
            if self.mesh is not None:
                from tts_tpu.parallel.data_parallel import shard_batch
                jb = shard_batch(jb, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, losses = step_fn(
                self.params, self.opt_state, jb, step_rng)
            from tts_tpu.train.trainer_tts import _fetch_scalars
            losses = _fetch_scalars(losses)  # one tunnel fetch, not one per loss
            losses["step_time"] = timer.lap()
            losses["loader_time"] = loader_time
            keep.update_values({f"avg_{k}": v for k, v in losses.items()})
            self.global_step += 1
            self.tb.tb_train_iter_stats(self.global_step, losses)
            if self.global_step % c.get("save_step", 10000) == 0:
                self.save_checkpoint()
        self.console.print_train_epoch_end(self.global_step, self.epoch, 0.0,
                                           keep.avg_values)
        return keep.avg_values

    def fit(self) -> None:
        # save_best_every: best-model checkpointing fetches the FULL param
        # tree host-side (hundreds of leaves x ~25 ms tunnel RTT each +
        # ~90 MB write) — doing that every epoch dominated wall time on
        # small-corpus runs where the loss improves every epoch (measured
        # 2026-08-21: glow real-LJSpeech epochs 0.3 s step, minutes in
        # save_best). Default 1 keeps the reference's per-epoch behavior.
        every = self.c.get("save_best_every", 1)
        for self.epoch in range(self.epoch, self.c["epochs"]):
            self.console.print_epoch_start(self.epoch, self.c["epochs"])
            stats = self.train_epoch()
            if (self.epoch + 1) % every == 0 or \
                    self.epoch == self.c["epochs"] - 1:
                self.best_loss = ckpt_io.save_best_model(
                    stats.get("avg_loss", float("inf")), self.best_loss,
                    self.output_path, params=self.params,
                    opt_state=self.opt_state, step=self.global_step,
                    epoch=self.epoch)
        if self.c.get("checkpoint", True):
            self.save_checkpoint()

    def save_checkpoint(self) -> str:
        return ckpt_io.save_checkpoint(
            self.output_path, params=self.params, opt_state=self.opt_state,
            step=self.global_step, epoch=self.epoch, config=self.c)

    def restore(self, path: str) -> None:
        ckpt = ckpt_io.load_checkpoint(path)
        self.global_step = ckpt["meta"].get("step", 0)
        self.epoch = ckpt["meta"].get("epoch", 0)
        self.params = ckpt["params"]
        self.opt_state = None  # rebuilt at first step if not restorable
        if ckpt.get("opt_state") is not None:
            from flax import serialization
            try:
                self.opt_state = serialization.from_state_dict(
                    self.tx.init(self.params), ckpt["opt_state"])
            except (KeyError, ValueError):
                self.opt_state = self.tx.init(self.params)
        else:
            self.opt_state = self.tx.init(self.params)
