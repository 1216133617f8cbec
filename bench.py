"""Benchmark: synthesized audio-seconds per second per chip (mel + vocoder).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The pipeline measured is the flagship serving path: batched Tacotron2
autoregressive mel decode (scan) -> Multiband-MelGAN vocoder (+PQMF
synthesis) -> waveform, all jitted on one chip. The reference publishes no
numbers (BASELINE.md); its implicit production bar is real-time (RTF=1.0)
single-stream synthesis, so vs_baseline = audio_seconds_per_second / 1.0.
"""

import json
import time

import jax
import jax.numpy as jnp

SR = 22050
HOP = 256


def build_pipeline(batch=8, t_text=128, steps=124, r=2):
    from tts_tpu.models.tacotron2 import Tacotron2
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator

    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(num_chars=128, r=r)
    text = jax.random.randint(rng, (batch, t_text), 0, 128)
    text_len = jnp.full((batch,), t_text, jnp.int32)
    mel0 = jnp.zeros((batch, steps * r, 80))
    mel_len = jnp.full((batch,), steps * r, jnp.int32)
    taco_vars = taco.init({"params": rng, "dropout": rng}, text, text_len,
                          mel0, mel_len)

    # Multiband-MelGAN with (2,8,2,2) upsampling: 64x per subband, 4 subbands
    # -> hop 256 samples per frame after PQMF synthesis
    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel_probe = jnp.zeros((batch, steps * r, 80))
    voc_vars = voc.init(rng, mel_probe)

    @jax.jit
    def synthesize(taco_vars, voc_vars, text, text_len):
        out = taco.apply(taco_vars, text, text_len,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         method=taco.inference, max_decoder_steps=steps,
                         use_windowing=False)
        mel = out["postnet_outputs"]
        sub = voc.apply(voc_vars, mel)
        wav = voc.pqmf.synthesis(sub)
        return wav

    return synthesize, (taco_vars, voc_vars, text, text_len)


def main():
    batch, steps, r = 8, 124, 2
    fn, args = build_pipeline(batch=batch, steps=steps, r=r)
    wav = fn(*args)
    jax.block_until_ready(wav)  # compile
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        wav = fn(*args)
    jax.block_until_ready(wav)
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = batch * wav.shape[1] / SR
    throughput = audio_seconds / dt
    print(json.dumps({
        "metric": "synthesized_audio_seconds_per_s_per_chip",
        "value": round(float(throughput), 3),
        "unit": "audio_s/s",
        "vs_baseline": round(float(throughput) / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
