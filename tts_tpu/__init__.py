"""tts_tpu — a TPU-native text-to-speech framework (JAX / XLA / Pallas / pjit).

Covers the full text -> mel -> waveform stack:

- Text-to-spectrogram models: Tacotron (CBHG), Tacotron2, Glow-TTS.
- GAN vocoders: MelGAN, Multiband-MelGAN (+PQMF), Fullband-MelGAN,
  ParallelWaveGAN, GAN-TTS random-window discriminators.
- Speaker encoder: GE2E / AngleProto LSTM d-vector model.
- Training: jit/shard_map SPMD trainers with psum gradient reduction,
  orbax-style checkpointing, console + TensorBoard logging.
- Inference/serving: synthesis pipeline, CLI, HTTP server.

Design stance (TPU-first, not a port):
- functional core: flax modules + optax transforms, pure losses;
- static shapes with length bucketing; lax.scan decoders instead of
  Python autoregressive loops;
- Pallas kernels for host-bound / fusion-critical ops (monotonic
  alignment search wavefront DP);
- one SPMD program over a `jax.sharding.Mesh` instead of process-per-GPU
  NCCL (capability parity with the reference's TTS/bin/distribute.py).
"""

__version__ = "0.1.0"
