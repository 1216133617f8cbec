"""Synthesizer: checkpointed TTS model + optional GAN vocoder, sentence-wise.

Capability parity with /root/reference/TTS/server/synthesizer.py:28-193
(model + vocoder loading, pysbd sentence segmentation -> regex splitter here,
per-sentence synthesis with silence joins, RTF logging).
"""

from __future__ import annotations

import re
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import AudioProcessor
from tts_tpu.config import load_config
from tts_tpu.infer.synthesis import synthesis
from tts_tpu.models.registry import setup_model
from tts_tpu.text import num_symbols
from tts_tpu.train.checkpoint import load_checkpoint

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z\"'(])|(?<=[.!?])$")


def _megakernel_ok(gen, t_frames: int) -> bool:
    from tts_tpu.ops.pallas.fused_melgan import megakernel_supported
    return megakernel_supported(gen, t_frames)


def split_into_sentences(text: str) -> List[str]:
    """Regex sentence segmentation (pysbd-free ≙ synthesizer.py:129-133)."""
    parts = [s.strip() for s in _SENTENCE_RE.split(text.strip())]
    return [s for s in parts if s]


class Synthesizer:
    def __init__(
        self,
        tts_checkpoint: str,
        tts_config: str,
        vocoder_checkpoint: Optional[str] = None,
        vocoder_config: Optional[str] = None,
        use_cuda: bool = False,  # accepted for reference-CLI compat; ignored
    ):
        self.tts_config = load_config(tts_config)
        self.ap = AudioProcessor(**self.tts_config.audio)
        self.model = setup_model(
            num_symbols(self.tts_config.get("use_phonemes", False)),
            self.tts_config.get("num_speakers", 1), self.tts_config)
        ckpt = load_checkpoint(tts_checkpoint)
        # honor the checkpoint's reduction factor: a gradual-training run
        # stopped mid-schedule serves at its trained r, not the config's
        ckpt_r = (ckpt.get("meta") or {}).get("r")
        if ckpt_r and hasattr(self.model, "r") and self.model.r != ckpt_r:
            self.model = self.model.clone(r=ckpt_r)
        self.variables = {"params": ckpt["params"]}
        if ckpt.get("batch_stats"):
            self.variables["batch_stats"] = ckpt["batch_stats"]
        # Checkpoints restore as HOST numpy arrays; without an explicit
        # device_put every jitted request re-uploads the full param tree
        # through the tunnel (~190 MB ≈ 2 s/request — measured 2026-08-21,
        # scripts/probe_single_stream.py: 1975 ms/call vs 32 ms with
        # device-resident params). One transfer at load, then serve.
        self.variables = jax.device_put(self.variables)

        self.vocoder_model = None
        self.vocoder_variables = None
        if vocoder_checkpoint:
            from tts_tpu.models.vocoder.registry import setup_generator
            self.vocoder_config = load_config(vocoder_config)
            self.vocoder_model = setup_generator(self.vocoder_config)
            vckpt = load_checkpoint(vocoder_checkpoint)
            params = vckpt["params"]
            # fold weight norm once at load (≙ remove_weight_norm,
            # synthesizer.py:81-91) — serving runs bare convs. Run the fold
            # and megakernel packing ON THE HOST CPU DEVICE: dispatched
            # eagerly to the TPU they are hundreds of tiny ops x ~25 ms
            # tunnel RTT (~60 s of the measured 65 s load, probe_cold_start
            # 2026-08-21); on CPU they take ~1 s, then one device_put.
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:  # no host CPU platform registered
                cpu = None
            with jax.default_device(cpu):
                if getattr(self.vocoder_model, "use_weight_norm", False):
                    from tts_tpu.models.vocoder.fold import fold_weight_norm
                    params = fold_weight_norm(params)
                    self.vocoder_model = self.vocoder_model.clone(
                        use_weight_norm=False)
            voc_vars = {"params": params}
            if vckpt.get("batch_stats"):   # e.g. WaveRNN's MelResNet BNs
                voc_vars["batch_stats"] = vckpt["batch_stats"]
            self.vocoder_variables = jax.device_put(voc_vars)
            self.vocoder_ap = AudioProcessor(**self.vocoder_config.audio)
            # WaveRNN generates prod(upsample_factors) samples per mel frame;
            # if that disagrees with the audio config's hop_length the output
            # would be silently mis-trimmed/misaligned (the external fatchord
            # reference asserts total_scale == hop_length for the same
            # reason). Fail loudly at load instead.
            from tts_tpu.models.vocoder.wavernn import WaveRNN
            if isinstance(self.vocoder_model, WaveRNN):
                if self.vocoder_model.hop != self.vocoder_ap.hop_length:
                    raise ValueError(
                        f"WaveRNN upsample_factors product "
                        f"({self.vocoder_model.hop}) != vocoder audio "
                        f"hop_length ({self.vocoder_ap.hop_length}); "
                        f"fix the vocoder config")
            # same loud-failure guard for the iSTFT-head family: it emits
            # prod(upsample_factors) * hop_head samples per mel frame
            from tts_tpu.models.vocoder.istft_melgan import \
                ISTFTMelganGenerator
            if isinstance(self.vocoder_model, ISTFTMelganGenerator):
                total = self.vocoder_model.hop_head
                for f in self.vocoder_model.upsample_factors:
                    total *= f
                if total != self.vocoder_ap.hop_length:
                    raise ValueError(
                        f"iSTFT-MelGAN total hop ({total}) != vocoder audio "
                        f"hop_length ({self.vocoder_ap.hop_length}); "
                        f"fix the vocoder config")
            # pack once for the whole-generator Pallas megakernel (the
            # fastest serving path; ops/pallas/fused_melgan.py) — on the
            # host CPU device for the same RTT reason as the fold above,
            # then one transfer
            self._megakernel_packed = None
            from tts_tpu.models.vocoder.melgan import MelganGenerator
            # Pallas lowers only on TPU — on a CPU backend (tests, offline
            # artifact synthesis) serve through the plain XLA generator
            if (jax.default_backend() != "cpu"
                    and isinstance(self.vocoder_model, MelganGenerator)
                    and not self.vocoder_model.use_weight_norm
                    and not any(f % 2
                                for f in self.vocoder_model.upsample_factors)):
                from tts_tpu.ops.pallas.fused_melgan import \
                    pack_generator_params
                with jax.default_device(cpu):
                    packed = pack_generator_params(
                        self.vocoder_model, params, fuse_pqmf=True)
                self._megakernel_packed = jax.device_put(packed)

    def _vocode(self, mel_norm: np.ndarray) -> np.ndarray:
        """Normalized mel -> waveform through the GAN vocoder
        (≙ synthesizer.py:151-159). MelGAN-family generators with folded
        weight norm take the Pallas fused serving path.

        The mel length is bucketed (rounded up to 32 frames, edge-padded;
        output sliced back) and each path runs through a cached jax.jit —
        otherwise every distinct utterance length triggers a minutes-long
        compile through the tunnel, and eager op-by-op dispatch costs
        seconds per request (see run_model's cache note).

        Numerics note (PARITY.md "mel-length bucketing"): unlike the text
        bucketing (bit-equal, masked attention), the vocoder's conv
        receptive field reaches into the edge-replicated pad frames, so the
        last ~receptive-field samples of the sliced-back waveform differ
        slightly from unpadded inference. The reference's own
        `inference_padding` edge-pad (melgan_generator.py:90-95) introduces
        the same class of boundary effect; accepted serving approximation."""
        from tts_tpu.models.vocoder.melgan import MelganGenerator

        n = mel_norm.shape[0]
        nb = max(32, -(-n // 32) * 32)
        if nb > n:
            mel_norm = np.pad(mel_norm, ((0, nb - n), (0, 0)), mode="edge")
        mel = jnp.asarray(mel_norm)[None]
        gen = self.vocoder_model
        if not hasattr(self, "_vocoder_jit"):
            self._vocoder_jit = {}

        def jitted(name, build):
            fn = self._vocoder_jit.get(name)
            if fn is None:
                # AotJit == jax.jit + on-disk AOT executable store: a
                # rebooted server restores the compiled vocoder in ~1 s
                # instead of re-linking through the tunnel (utils/aot.py)
                from tts_tpu.utils.aot import AotJit
                fn = self._vocoder_jit[name] = AotJit(
                    build(), f"vocoder_{name}")
            return fn

        from tts_tpu.models.vocoder.wavernn import WaveRNN
        if isinstance(gen, WaveRNN):
            # ≙ the reference's external-WaveRNN branch
            # (synthesizer.py:160-169): edge-pad the conditioning context
            # frames, autoregressive sample scan, fixed seed per request
            mel_p = jnp.pad(mel, ((0, 0), (gen.pad, gen.pad), (0, 0)),
                            mode="edge")
            fn = jitted("wavernn", lambda: (
                lambda variables, m: gen.apply(variables, m,
                                               jax.random.PRNGKey(0),
                                               method=gen.generate)))
            wav = fn(self.vocoder_variables, mel_p)[..., None]
        elif (getattr(self, "_megakernel_packed", None) is not None
                and _megakernel_ok(gen, mel.shape[1])):
            from tts_tpu.ops.pallas.fused_melgan import megakernel_inference
            fn = jitted("mega", lambda: (
                lambda packed, m: megakernel_inference(gen, packed, m)))
            wav = fn(self._megakernel_packed, mel)
        elif (jax.default_backend() != "cpu"
                and isinstance(gen, MelganGenerator)
                and not getattr(gen, "use_weight_norm", True)):
            # per-stack Pallas kernels — TPU only, like the megakernel
            from tts_tpu.models.vocoder.serving import fused_inference
            fn = jitted("fused", lambda: (
                lambda params, m: fused_inference(gen, params, m)))
            wav = fn(self.vocoder_variables["params"], mel)
        elif hasattr(gen, "inference"):
            fn = jitted("inference", lambda: (
                lambda variables, m: gen.apply(variables, m,
                                               method=gen.inference)))
            wav = fn(self.vocoder_variables, mel)
        else:
            fn = jitted("apply", lambda: (
                lambda variables, m: gen.apply(variables, m)))
            wav = fn(self.vocoder_variables, mel)
        wav = np.asarray(wav)[0, :, 0]
        hop = getattr(self.vocoder_ap, "hop_length", 256)
        return wav[:n * hop] if n < nb else wav

    def prewarm(self, buckets: Optional[List[int]] = None,
                speaker_id: Optional[int] = None,
                mel_buckets: Optional[List[int]] = None) -> None:
        """Compile the serving graphs for each text-length bucket up front
        (server --prewarm): each distinct bucket is a separate XLA program
        whose cold compile costs minutes through the device tunnel —
        paying them at boot keeps first-user-request latency at the warm
        ~140 ms (measured 2026-08-21, scripts/bench_single_stream.py).
        With the persistent compilation cache only the first boot pays.

        ``speaker_id`` is forwarded so multi-speaker models compile the
        graph they will actually serve (an int input changes no XLA
        program, but a model *requiring* speaker conditioning would raise
        on None). ``mel_buckets`` additionally compiles the vocoder for
        those mel-frame bucket lengths (multiples of 32, see _vocode) —
        the text-driven prewarm only reaches the mel buckets its fixed
        sentences happen to produce; real requests can land on others."""
        t0 = time.time()
        if speaker_id is None and self.tts_config.get("num_speakers", 1) > 1:
            speaker_id = 0
        from tts_tpu.infer.synthesis import TEXT_BUCKETS
        # beyond 256 symbols is past the longest realistic single sentence
        todo = buckets if buckets else [b for b in TEXT_BUCKETS if b <= 256]
        for b in todo:
            self.tts("a" * max(1, b - 2) + ".", speaker_id=speaker_id)
        n_mel = 0
        if mel_buckets and self.vocoder_model is not None:
            n_mels = self.tts_config["audio"].get("num_mels", 80)
            for mb in mel_buckets:
                self._vocode(np.zeros((mb, n_mels), np.float32))
                n_mel += 1
        print(f" > Prewarmed {len(todo)} text buckets + {n_mel} mel buckets "
              f"in {time.time() - t0:.1f}s", flush=True)

    def tts_stream(self, text: str, speaker_id: Optional[int] = None,
                   chunk_chars: int = 48, decoder_steps: int = 128):
        """Generator of waveform chunks: first audio leaves after ONE text
        chunk's decode (infer/streaming.py chunked inference_truncated),
        instead of after the full utterance. Tacotron family only."""
        from tts_tpu.infer.streaming import stream_mel_chunks
        for sentence in split_into_sentences(text) or [text]:
            for piece in stream_mel_chunks(
                    self.model, self.variables, sentence, self.tts_config,
                    chunk_chars=chunk_chars, decoder_steps=decoder_steps,
                    speaker_id=speaker_id):
                mel = piece["mel"]
                if mel.shape[0] == 0:
                    continue
                if self.vocoder_model is not None:
                    yield self._vocode(mel)
                else:
                    from tts_tpu.infer.synthesis import inv_spectrogram
                    yield inv_spectrogram(mel, self.ap, self.tts_config)
            yield np.zeros(10000, np.float32)  # inter-sentence gap

    def tts(self, text: str, speaker_id: Optional[int] = None) -> np.ndarray:
        """Full text -> waveform with sentence joins + RTF print
        (≙ Synthesizer.tts, synthesizer.py:135-193)."""
        start = time.time()
        wavs: List[np.ndarray] = []
        sentences = split_into_sentences(text) or [text]
        for sentence in sentences:
            result = synthesis(
                self.model, self.variables, sentence, self.tts_config,
                self.ap, use_griffin_lim=self.vocoder_model is None,
                speaker_id=speaker_id,
                do_trim_silence=self.tts_config.get("do_trim_silence", False))
            if self.vocoder_model is not None:
                wav = self._vocode(result["postnet_outputs"])
            else:
                wav = result["wav"]
            wavs.append(wav)
            wavs.append(np.zeros(10000, np.float32))  # inter-sentence gap
        out = np.concatenate(wavs)
        process_time = time.time() - start
        audio_time = len(out) / self.ap.sample_rate
        print(f" > Processing time: {process_time:.3f}")
        print(f" > Real-time factor: {process_time / max(audio_time, 1e-6):.3f}")
        return out
