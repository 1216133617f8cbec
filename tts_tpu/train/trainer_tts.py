"""Tacotron/Tacotron2 trainer: the end-to-end training orchestration.

Capability parity with /root/reference/TTS/bin/train_tts.py (config -> data ->
model -> optimizer -> epoch loop with eval, checkpointing, gradual training,
TB + console logging, test-sentence synthesis), re-designed around one jitted
(optionally shard_map data-parallel) train step. Changing r mid-run swaps the
compiled step (params keep their r_init-sized shapes).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import AudioProcessor
from tts_tpu.config import check_config_tts
from tts_tpu.data import TTSDataset, load_meta_data
from tts_tpu.data.formatters import get_speakers
from tts_tpu.models.registry import setup_model
from tts_tpu.text import make_charmaps, num_symbols
from tts_tpu.text.symbols import make_symbols
from tts_tpu.train import checkpoint as ckpt_io
from tts_tpu.train.optim import gradual_training_schedule, make_optimizer
from tts_tpu.train.state import (create_train_state, make_eval_step,
                                 make_train_step)
from tts_tpu.utils.generic import KeepAverage, StepTimer
from tts_tpu.utils.loggers import ConsoleLogger, TensorboardLogger


class TTSTrainer:
    def __init__(self, config: Dict[str, Any], output_path: str,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — the train
        step then runs SPMD with pmean gradient reduction (set
        ``config['use_data_parallel']`` to build one over all devices)."""
        check_config_tts(config)
        self.c = config
        self.output_path = output_path
        os.makedirs(output_path, exist_ok=True)
        self.ap = AudioProcessor(**config["audio"])
        self.mesh = mesh
        if mesh is None and config.get("use_data_parallel", False):
            from tts_tpu.parallel import make_mesh
            self.mesh = make_mesh((("data", -1),))

        # text frontend (custom charset support ≙ train_tts.py:486-487)
        self.tp = None
        use_phonemes = config.get("use_phonemes", False)
        if config.get("characters"):
            ch = config["characters"]
            syms, phs = make_symbols(
                ch["characters"], ch.get("phonemes"),
                ch.get("punctuations", "!'(),-.:;? "),
                ch.get("pad", "_"), ch.get("eos", "~"), ch.get("bos", "^"))
            table = phs if use_phonemes else syms
            s2i, i2s, p2i, i2p = make_charmaps(syms, phs)
            self.tp = p2i if use_phonemes else s2i
            self.num_chars = len(table)
        else:
            self.num_chars = num_symbols(use_phonemes)

        # data
        self.meta_train, self.meta_eval = load_meta_data(config["datasets"])
        self.num_speakers = 1
        self.speaker_mapping = None
        self.speaker_embedding_mapping = None
        self.speaker_embedding_dim = 0
        if config.get("use_speaker_embedding", False):
            if config.get("use_external_speaker_embedding_file", False):
                # per-utterance d-vectors from speakers.json
                # (≙ train_tts.py:504-540 external embedding path)
                from tts_tpu.utils.speakers import load_speaker_mapping
                mapping = load_speaker_mapping(
                    config["external_speaker_embedding_file"])
                self.speaker_embedding_mapping = {
                    k: v["embedding"] for k, v in mapping.items()}
                speakers = sorted({v["name"] for v in mapping.values()})
                self.num_speakers = len(speakers)
                self.speaker_embedding_dim = len(
                    next(iter(self.speaker_embedding_mapping.values())))
            else:
                speakers = get_speakers(self.meta_train)
                self.speaker_mapping = {s: i for i, s in enumerate(speakers)}
                self.num_speakers = len(speakers)

        # model + optimizer; r_init = max r in the gradual schedule
        gradual = config.get("gradual_training") or []
        r_init = max([config.get("r", 7)] + [e[1] for e in gradual])
        self.r_init = r_init
        self.r = config.get("r", 7)
        self.model = setup_model(self.num_chars, self.num_speakers, config,
                                 speaker_embedding_dim=self.speaker_embedding_dim)
        if hasattr(self.model, "r_init"):
            self.model = self.model.clone(r_init=r_init)
        self.tx = make_optimizer(
            lr=config.get("lr", 1e-4),
            grad_clip=config.get("grad_clip", 5.0),
            weight_decay=config.get("wd", 0.0),
            use_noam=config.get("noam_schedule", False),
            warmup_steps=config.get("warmup_steps", 4000))

        self.loss_kwargs = dict(
            loss_masking=config.get("loss_masking", True),
            seq_len_norm=config.get("seq_len_norm", False),
            decoder_alpha=config.get("decoder_loss_alpha", 0.25),
            postnet_alpha=config.get("postnet_loss_alpha", 0.25),
            ga_alpha=config.get("ga_alpha", 0.0),
            decoder_diff_spec_alpha=config.get("decoder_diff_spec_alpha", 0.0),
            postnet_diff_spec_alpha=config.get("postnet_diff_spec_alpha", 0.0),
            use_linear=config["model"].lower() == "tacotron",
        )

        self.console = ConsoleLogger()
        self.tb = TensorboardLogger(output_path, config["model"])
        self.global_step = 0
        self.epoch = 0
        self.best_loss = float("inf")
        self.state = None
        self._datasets: Dict[Any, TTSDataset] = {}
        self._steps: Dict[int, Any] = {}
        self._eval_step_fn = None
        self.rng = jax.random.PRNGKey(config.get("seed", 54321))

    # -- dataset ----------------------------------------------------------

    def _dataset(self, is_eval: bool, r: int) -> TTSDataset:
        # memoized per (split, r): re-creating the dataset every epoch would
        # drop the in-memory feature cache and re-sort/re-read metadata
        key = (is_eval, r)
        if key not in self._datasets:
            self._datasets[key] = self._build_dataset(is_eval, r)
        return self._datasets[key]

    def _build_dataset(self, is_eval: bool, r: int) -> TTSDataset:
        c = self.c
        return TTSDataset(
            self.ap,
            self.meta_eval if is_eval else self.meta_train,
            outputs_per_step=r,
            text_cleaner=c.get("text_cleaner", "english_cleaners"),
            compute_linear_spec=c["model"].lower() == "tacotron",
            min_seq_len=0 if is_eval else c.get("min_seq_len", 0),
            max_seq_len=float("inf") if is_eval else c.get("max_seq_len", float("inf")),
            use_phonemes=c.get("use_phonemes", False),
            phoneme_cache_path=c.get("phoneme_cache_path"),
            phoneme_language=c.get("phoneme_language", "en-us"),
            enable_eos_bos=c.get("enable_eos_bos_chars", False),
            speaker_id_mapping=self.speaker_mapping,
            speaker_embedding_mapping=self.speaker_embedding_mapping,
            batch_group_size=0 if is_eval else c.get("batch_group_size", 0),
            cache_features=c.get("cache_features", False),
            tp=self.tp)

    # -- state / steps -----------------------------------------------------

    def _ensure_state(self, batch: Dict) -> None:
        if self.state is None:
            init_rng, self.rng = jax.random.split(self.rng)
            self.state = create_train_state(
                self.model, init_rng, _to_jnp(batch), self.tx)
            if self.mesh is not None:
                from tts_tpu.parallel import replicate
                self.state = replicate(self.state, self.mesh)

    def _train_step_for_r(self, r: int):
        if r not in self._steps:
            model = self.model.clone(r=r) if r != self.model.r else self.model
            amp = self.c.get("mixed_precision", False)
            if self.mesh is not None:
                from tts_tpu.parallel import make_dp_train_step
                self._steps[r] = make_dp_train_step(
                    model, self.mesh, {**self.loss_kwargs, "r": r},
                    mixed_precision=amp)
            else:
                self._steps[r] = make_train_step(
                    model, {**self.loss_kwargs, "r": r}, jit=True,
                    mixed_precision=amp)
        return self._steps[r]

    def _eval_step(self):
        if self._eval_step_fn is None:
            self._eval_step_fn = make_eval_step(
                self.model.clone(r=self.r),
                {**self.loss_kwargs, "r": self.r}, jit=True)
        return self._eval_step_fn

    # -- restore -----------------------------------------------------------

    def restore(self, path: str, reinit_layers=None) -> None:
        ckpt = ckpt_io.load_checkpoint(path)
        self.global_step = ckpt["meta"].get("step", 0)
        self.epoch = ckpt["meta"].get("epoch", 0)
        self.r = ckpt["meta"].get("r", self.r)
        self._restored = (ckpt, reinit_layers)

    def _apply_restore(self) -> None:
        if not hasattr(self, "_restored"):
            return
        ckpt, reinit_layers = self._restored
        from flax import serialization

        if reinit_layers:
            params = ckpt_io.partial_restore(self.state.params,
                                             ckpt["params"], reinit_layers)
            self.state = self.state.replace(params=params)
        else:
            params = serialization.from_state_dict(self.state.params,
                                                   ckpt["params"])
            new_opt = self.state.opt_state
            if ckpt.get("opt_state") is not None:
                try:
                    new_opt = serialization.from_state_dict(
                        self.state.opt_state, ckpt["opt_state"])
                except (KeyError, ValueError):
                    pass  # optimizer shape changed -> fresh opt state
            self.state = self.state.replace(
                params=jax.device_put(params),
                opt_state=jax.device_put(new_opt),
                batch_stats=jax.device_put(
                    ckpt.get("batch_stats") or self.state.batch_stats),
                step=self.global_step)
        del self._restored

    # -- loops -------------------------------------------------------------

    def train_epoch(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        c = self.c
        gradual = c.get("gradual_training") or []
        if gradual:
            self.r, batch_size_g = gradual_training_schedule(
                self.global_step, gradual)
            batch_size = batch_size or batch_size_g
        batch_size = batch_size or c["batch_size"]

        ds = self._dataset(is_eval=False, r=self.r)
        step_fn = self._train_step_for_r(self.r)
        keep = KeepAverage()
        timer = StepTimer()
        self.console.print_train_start()
        # host-local input sharding (≙ per-rank DistributedSampler slices)
        n_proc = jax.process_count()
        n_batches = max(len(ds) // (batch_size * n_proc), 1)
        for i, batch in enumerate(ds.batches(batch_size, shuffle=True,
                                             seed=self.epoch,
                                             num_shards=n_proc,
                                             shard_id=jax.process_index())):
            loader_time = timer.lap()
            jb = _to_jnp(batch)
            self._ensure_state(jb)
            self._apply_restore()
            if self.mesh is not None:
                from tts_tpu.parallel.data_parallel import shard_batch
                jb = shard_batch(jb, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, losses = step_fn(self.state, jb, step_rng)
            losses = _fetch_scalars(losses)
            step_time = timer.lap()
            losses["step_time"] = step_time
            losses["loader_time"] = loader_time
            keep.update_values({f"avg_{k}": v for k, v in losses.items()})
            self.global_step += 1
            if self.global_step % c.get("print_step", 25) == 0:
                self.console.print_train_step(
                    n_batches, i, self.global_step, losses, keep.avg_values)
            if self.global_step % c.get("save_step", 10000) == 0 and \
                    c.get("checkpoint", True):
                self.save_checkpoint()
            self.tb.tb_train_iter_stats(self.global_step, losses)
        self.console.print_train_epoch_end(self.global_step, self.epoch,
                                           0.0, keep.avg_values)
        return keep.avg_values

    def eval_epoch(self) -> Dict[str, float]:
        c = self.c
        ds = self._dataset(is_eval=True, r=self.r)
        step_fn = self._eval_step()
        keep = KeepAverage()
        self.console.print_eval_start()
        bs = min(c.get("eval_batch_size", 16), max(len(ds), 1))
        for i, batch in enumerate(ds.batches(bs, shuffle=False)):
            jb = _to_jnp(batch)
            self._ensure_state(jb)
            self._apply_restore()
            self.rng, step_rng = jax.random.split(self.rng)
            losses = step_fn(self.state, jb, step_rng)
            keep.update_values(
                {f"avg_{k}": v for k, v in _fetch_scalars(losses).items()})
        self.console.print_epoch_end(self.epoch, keep.avg_values)
        self.tb.tb_eval_stats(self.global_step, keep.avg_values)
        return keep.avg_values

    DEFAULT_TEST_SENTENCES = [
        "It took me quite a long time to develop a voice, and now that I "
        "have it I'm not going to be silent.",
        "Be a voice, not an echo.",
    ]

    def test_run(self) -> Dict[str, np.ndarray]:
        """Synthesize test sentences with Griffin-Lim and log audio + figures
        (≙ evaluate()'s test-sentence block, train_tts.py:445-476)."""
        from tts_tpu.infer.synthesis import synthesis
        from tts_tpu.utils.visual import plot_alignment, plot_spectrogram

        sentences = self.c.get("test_sentences") or self.DEFAULT_TEST_SENTENCES
        model = self.model.clone(r=self.r)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        audios, figures = {}, {}
        for i, sentence in enumerate(sentences):
            try:
                result = synthesis(model, variables, sentence, self.c, self.ap,
                                   tp=self.tp)
                audios[f"test_{i}"] = result["wav"]
                figures[f"test_{i}_spectrogram"] = plot_spectrogram(
                    result["postnet_outputs"])
                figures[f"test_{i}_alignment"] = plot_alignment(
                    result["alignments"])
            except Exception as e:  # a bad sentence must not kill training
                print(f" [!] test sentence failed: {e}")
        self.tb.tb_eval_audios(self.global_step, audios,
                               self.ap.sample_rate)
        self.tb.tb_eval_figures(self.global_step, figures)
        return audios

    def fit(self) -> None:
        c = self.c
        for self.epoch in range(self.epoch, c["epochs"]):
            self.console.print_epoch_start(self.epoch, c["epochs"])
            self.train_epoch()
            if c.get("run_eval", True):
                stats = self.eval_epoch()
                target = stats.get("avg_postnet_loss",
                                   stats.get("avg_loss", float("inf")))
                self.best_loss = ckpt_io.save_best_model(
                    target, self.best_loss, self.output_path,
                    params=self.state.params,
                    opt_state=self.state.opt_state,
                    batch_stats=self.state.batch_stats,
                    step=self.global_step, epoch=self.epoch, r=self.r)
            if self.epoch >= c.get("test_delay_epochs", 0) and \
                    c.get("run_test_sentences", False):
                self.test_run()
        # final save so a run whose last epoch ends between save_step
        # multiples still leaves a resumable checkpoint (the reference
        # only saves periodically, train_tts.py:254-259 — a short run
        # there can end checkpoint-less)
        if c.get("checkpoint", True):
            self.save_checkpoint()

    def save_checkpoint(self) -> str:
        return ckpt_io.save_checkpoint(
            self.output_path,
            params=self.state.params,
            opt_state=self.state.opt_state,
            batch_stats=self.state.batch_stats,
            step=self.global_step, epoch=self.epoch, r=self.r,
            config=self.c)


def _fetch_scalars(losses: Dict) -> Dict[str, float]:
    """Fetch a dict of device scalars as ONE stacked transfer: per-scalar
    float() costs a full ~25 ms tunnel round trip EACH (8 losses ≈ 0.2 s of
    the 0.4 s real-LJSpeech step), and every extra fetch is another shot at
    the rare axon stall (one hung a 1200-epoch run at epoch 1197)."""
    keys = sorted(losses)
    vals = np.asarray(jnp.stack([losses[k] for k in keys]))
    return {k: float(v) for k, v in zip(keys, vals)}


def _to_jnp(batch: Dict) -> Dict:
    out = {}
    for k, v in batch.items():
        if k == "item_idxs":
            continue
        out[k] = jnp.asarray(v)
    return out
