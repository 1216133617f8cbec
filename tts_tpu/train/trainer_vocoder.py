"""GAN vocoder trainer (≙ /root/reference/TTS/bin/train_vocoder.py:83-281,440-657).

Alternating G/D training with discriminator warmup; extends the reference by
running data-parallel-ready jitted steps (the reference's vocoder training is
single-GPU only — distributed code commented out, train_vocoder.py:22-23).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tts_tpu.audio import AudioProcessor
from tts_tpu.data.gan_dataset import GANDataset, load_wav_data
from tts_tpu.models.vocoder.registry import setup_discriminator, setup_generator
from tts_tpu.train import checkpoint as ckpt_io
from tts_tpu.train.gan import create_gan_states, make_gan_train_step
from tts_tpu.train.optim import make_optimizer
from tts_tpu.utils.generic import KeepAverage
from tts_tpu.utils.loggers import ConsoleLogger, TensorboardLogger


class VocoderTrainer:
    def __init__(self, config: Dict[str, Any], output_path: str):
        self.c = config
        self.output_path = output_path
        os.makedirs(output_path, exist_ok=True)
        self.ap = AudioProcessor(**config["audio"])

        eval_split = config.get("eval_split_size", 10)
        self.eval_items, self.train_items = load_wav_data(
            config["data_path"], eval_split)

        self.gen = setup_generator(config)
        self.disc = setup_discriminator(config)
        gen_name = config["generator_model"].lower()
        self.use_pqmf = "multiband" in gen_name
        self.needs_noise = "wavegan" in gen_name
        self.disc_takes_cond = "random_window" in \
            config["discriminator_model"].lower()

        self.tx_G = make_optimizer(lr=config.get("lr_gen", 1e-4),
                                   grad_clip=config.get("grad_clip", 10.0))
        self.tx_D = make_optimizer(lr=config.get("lr_disc", 1e-4),
                                   grad_clip=config.get("grad_clip", 10.0))

        self.gen_loss_kwargs = {
            k: config[k] for k in (
                "use_stft_loss", "use_mse_gan_loss", "use_hinge_gan_loss",
                "use_feat_match_loss", "stft_loss_weight",
                "subband_stft_loss_weight", "mse_G_loss_weight",
                "hinge_G_loss_weight", "feat_match_loss_weight")
            if k in config}
        self.disc_loss_kwargs = {
            k: config[k] for k in ("use_mse_gan_loss", "use_hinge_gan_loss")
            if k in config}

        self.console = ConsoleLogger()
        self.tb = TensorboardLogger(output_path, "vocoder")
        self.rng = jax.random.PRNGKey(config.get("seed", 54321))
        self.global_step = 0
        self.epoch = 0
        self.best_loss = float("inf")
        self.state_G = None
        self.state_D = None
        self._steps: Dict[bool, Any] = {}

    def _dataset(self, is_eval: bool) -> GANDataset:
        c = self.c
        return GANDataset(
            self.ap, self.eval_items if is_eval else self.train_items,
            seq_len=c.get("seq_len", 8192),
            hop_len=c["audio"].get("hop_length", 256),
            pad_short=c.get("pad_short", 2000),
            conv_pad=c.get("conv_pad", 0),
            is_training=not is_eval,
            use_noise_augment=c.get("use_noise_augment", False) and not is_eval,
            use_cache=c.get("use_cache", False))

    def _init_states(self, batch: Dict) -> None:
        if self.state_G is None:
            init_rng, self.rng = jax.random.split(self.rng)
            self.state_G, self.state_D = create_gan_states(
                self.gen, self.disc, batch["G"], init_rng, self.tx_G,
                self.tx_D, disc_takes_cond=self.disc_takes_cond,
                needs_noise=self.needs_noise)

    def _step(self, train_disc: bool):
        if train_disc not in self._steps:
            self._steps[train_disc] = make_gan_train_step(
                self.gen, self.disc,
                hop_len=self.c["audio"].get("hop_length", 256),
                conv_pad=self.c.get("conv_pad", 0),
                use_pqmf=self.use_pqmf,
                needs_noise=self.needs_noise,
                disc_takes_cond=self.disc_takes_cond,
                train_disc=train_disc,
                gen_loss_kwargs=self.gen_loss_kwargs,
                disc_loss_kwargs=self.disc_loss_kwargs,
                # config "mixed_precision" ≙ the reference's apex-AMP flag;
                # bf16 G/D forwards with f32 masters — measured 111.5 ->
                # 77.8 ms/step on the chip (CLAUDE.md GAN mixed precision)
                mixed_precision=self.c.get("mixed_precision", False))
        return self._steps[train_disc]

    def train_epoch(self) -> Dict[str, float]:
        c = self.c
        ds = self._dataset(is_eval=False)
        keep = KeepAverage()
        warmup = c.get("steps_to_start_discriminator", 0)
        for batch in ds.batches(c.get("batch_size", 8), shuffle=True,
                                seed=self.epoch):
            jb = {side: {k: jnp.asarray(v) for k, v in b.items()}
                  for side, b in batch.items()}
            self._init_states(jb)
            train_disc = self.global_step >= warmup
            step_fn = self._step(train_disc)
            self.rng, step_rng = jax.random.split(self.rng)
            self.state_G, self.state_D, losses = step_fn(
                self.state_G, self.state_D, jb["G"], jb["D"], step_rng)
            from tts_tpu.train.trainer_tts import _fetch_scalars
            losses = _fetch_scalars(losses)  # one tunnel fetch, not one per loss
            keep.update_values({f"avg_{k}": v for k, v in losses.items()})
            self.global_step += 1
            self.tb.tb_train_iter_stats(self.global_step, losses)
            if self.global_step % c.get("save_step", 10000) == 0:
                self.save_checkpoint()
        ds.shuffle_mapping()  # re-pair G/D items each epoch
        self.console.print_train_epoch_end(self.global_step, self.epoch, 0.0,
                                           keep.avg_values)
        return keep.avg_values

    def fit(self) -> None:
        # save_best_every: see trainer_glow.fit — per-epoch best-model
        # writes fetch the full G param tree through the tunnel
        every = self.c.get("save_best_every", 1)
        for self.epoch in range(self.epoch, self.c["epochs"]):
            self.console.print_epoch_start(self.epoch, self.c["epochs"])
            stats = self.train_epoch()
            if (self.epoch + 1) % every == 0 or \
                    self.epoch == self.c["epochs"] - 1:
                self.best_loss = ckpt_io.save_best_model(
                    stats.get("avg_G_loss", float("inf")), self.best_loss,
                    self.output_path, params=self.state_G.params,
                    step=self.global_step, epoch=self.epoch)
        self.save_checkpoint()

    def save_checkpoint(self) -> str:
        """Dual G/D checkpoint (≙ vocoder/utils/io.py:21-60)."""
        path = ckpt_io.save_checkpoint(
            self.output_path, params=self.state_G.params,
            opt_state=self.state_G.opt_state, step=self.global_step,
            epoch=self.epoch, config=self.c)
        ckpt_io.save_checkpoint(
            self.output_path, params=self.state_D.params,
            opt_state=self.state_D.opt_state, step=self.global_step,
            epoch=self.epoch, prefix="checkpoint_disc")
        return path

    def restore(self, path: str) -> None:
        ckpt = ckpt_io.load_checkpoint(path)
        self.global_step = ckpt["meta"].get("step", 0)
        self.epoch = ckpt["meta"].get("epoch", 0)
        self._restore_G = ckpt["params"]
        # pair discriminator checkpoint if present
        disc_path = path.replace("checkpoint_", "checkpoint_disc_")
        if os.path.isfile(disc_path):
            self._restore_D = ckpt_io.load_checkpoint(disc_path)["params"]
