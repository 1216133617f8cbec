"""Benchmark: synthesized audio-seconds per second per chip (mel [+ vocoder]).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md) — its runtime prints RTF at
synthesis (/root/reference/TTS/bin/synthesize.py:34-37). We report the
equivalent: audio-seconds generated per wall-second on one chip, for a
batched Tacotron2 autoregressive decode (+ MelGAN vocoder once available).
vs_baseline is measured against a single-stream RTF=1.0 synthesizer (real
time), the reference's implicit production bar.
"""

import json
import time

import jax
import jax.numpy as jnp

SR = 22050
HOP = 256


def bench_tacotron2(batch: int = 8, t_text: int = 128, steps: int = 248,
                    r: int = 2, iters: int = 5):
    from tts_tpu.models.tacotron2 import Tacotron2

    model = Tacotron2(num_chars=128, r=r)
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (batch, t_text), 0, 128)
    text_len = jnp.full((batch,), t_text, jnp.int32)
    mel = jnp.zeros((batch, steps * r, 80))
    mel_len = jnp.full((batch,), steps * r, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, text, text_len,
                           mel, mel_len)

    @jax.jit
    def infer(variables, text, text_len):
        return model.apply(variables, text, text_len,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           method=model.inference, max_decoder_steps=steps,
                           use_windowing=False)["postnet_outputs"]

    out = infer(variables, text, text_len)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, text, text_len)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    frames = batch * steps * r
    audio_seconds = frames * HOP / SR
    return audio_seconds / dt


def main():
    throughput = bench_tacotron2()
    print(json.dumps({
        "metric": "synthesized_audio_seconds_per_s_per_chip",
        "value": round(float(throughput), 3),
        "unit": "audio_s/s",
        "vs_baseline": round(float(throughput) / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
