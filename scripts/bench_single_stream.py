"""Single-stream (batch-1) serving RTF on the real chip (VERDICT r1 item 3).

Builds a full-size random-init Tacotron2 + MB-MelGAN model pair in /tmp,
biases the stopnet so decode runs its full static budget (worst-case,
shape-honest timing — inference always scans max_decoder_steps and masks,
models/tacotron2.py:328-380), then measures:

  1. bin/synthesize.py CLI, cold process (pays import + compile; persistent
     compile cache ON, so a second cold process shows the cached-compile cost)
  2. same CLI again (warm disk cache)
  3. in-process repeat-call RTF (the steady-state a server request sees)
  4. HTTP server round trip (stdlib server, /api/tts)

Reference bar: per-request RTF printed by /root/reference/TTS/bin/
synthesize.py:34-37 + server/synthesizer.py:188-192.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_single_stream.py
"""

import json
import os
import subprocess
import sys
import time
import urllib.parse
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
MODEL_DIR = "/tmp/rtf_model"
SENTENCE = ("The quick brown fox jumps over the lazy dog, "
            "and the rain in Spain stays mainly in the plain.")


def build_models():
    import jax
    import jax.numpy as jnp

    from tts_tpu.config import load_config
    from tts_tpu.models.registry import setup_model
    from tts_tpu.models.vocoder.registry import setup_generator
    from tts_tpu.text import num_symbols
    from tts_tpu.train.checkpoint import save_checkpoint

    os.makedirs(MODEL_DIR, exist_ok=True)
    c = load_config(os.path.join(REPO, "configs", "tacotron2_ljspeech.json"))
    # serving configuration: final gradual-training stage r=2, 124-step
    # budget (248 frames = 2.88 s at hop 256 / 22050 Hz — a long sentence)
    c["r"] = 2
    c["max_decoder_steps"] = 124
    model = setup_model(num_symbols(c.get("use_phonemes", False)),
                        c.get("num_speakers", 1), c)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng},
                   jnp.zeros((1, 16), jnp.int32), jnp.array([16], jnp.int32),
                   jnp.zeros((1, 24, 80)), jnp.array([24], jnp.int32))
    from flax.core import unfreeze
    params = unfreeze(v["params"])
    # never-stop bias: decode always runs the full budget
    params["decoder"]["stopnet"]["linear"]["bias"] = jnp.full_like(
        params["decoder"]["stopnet"]["linear"]["bias"], -10.0)
    save_checkpoint(MODEL_DIR, params=params,
                    batch_stats=v.get("batch_stats"), step=1, r=2)
    with open(os.path.join(MODEL_DIR, "config.json"), "w") as f:
        json.dump(dict(c), f, default=str)

    vc = load_config(os.path.join(REPO, "configs", "multiband_melgan.json"))
    gen = setup_generator(vc)
    gv = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 80)))
    voc_dir = os.path.join(MODEL_DIR, "vocoder")
    save_checkpoint(voc_dir, params=gv["params"], step=1)
    with open(os.path.join(voc_dir, "config.json"), "w") as f:
        json.dump(dict(vc), f, default=str)
    return (os.path.join(MODEL_DIR, "checkpoint_1.ckpt"),
            os.path.join(MODEL_DIR, "config.json"),
            os.path.join(voc_dir, "checkpoint_1.ckpt"),
            os.path.join(voc_dir, "config.json"))


def run_cli(ckpt, cfg, vckpt, vcfg, tag):
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "tts_tpu.bin.synthesize", SENTENCE, cfg, ckpt,
         "/tmp/rtf_out", "--vocoder_path", vckpt,
         "--vocoder_config_path", vcfg],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ,
             "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"})
    wall = time.time() - t0
    print(f"[{tag}] wall {wall:.1f}s rc={out.returncode}")
    for line in out.stdout.splitlines():
        if "Run-time" in line or "Real-time" in line:
            print(f"[{tag}]{line}")
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-4000:])
    return out.returncode


def run_inprocess(ckpt, cfg, vckpt, vcfg):
    from tts_tpu.infer.synthesizer import Synthesizer
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    synth = Synthesizer(ckpt, cfg, vckpt, vcfg)
    synth.tts(SENTENCE)                          # warmup/compile
    times = []
    for _ in range(5):
        t0 = time.time()
        wav = synth.tts(SENTENCE)
        times.append(time.time() - t0)
    audio_s = len(wav) / synth.ap.sample_rate
    best = min(times)
    print(f"[steady ] {best*1e3:.0f} ms/request  audio {audio_s:.2f}s  "
          f"RTF {best/audio_s:.4f}  ({[round(t,3) for t in times]})")


def run_server(ckpt, cfg, vckpt, vcfg):
    proc = subprocess.Popen(
        [sys.executable, "-m", "tts_tpu.server.server", "--tts_checkpoint",
         ckpt, "--tts_config", cfg, "--vocoder_checkpoint", vckpt,
         "--vocoder_config", vcfg, "--port", "5477"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ,
             "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"})
    try:
        url = ("http://127.0.0.1:5477/api/tts?text="
               + urllib.parse.quote(SENTENCE))
        deadline = time.time() + 1500
        first = None
        while time.time() < deadline:
            try:
                t0 = time.time()
                wav = urllib.request.urlopen(url, timeout=1500).read()
                first = time.time() - t0
                break
            except Exception:
                time.sleep(2.0)
        if first is None:
            print("[server ] FAILED: no response before deadline")
            return
        t0 = time.time()
        wav = urllib.request.urlopen(url, timeout=300).read()
        warm = time.time() - t0
        print(f"[server ] first request {first:.1f}s, warm request "
              f"{warm*1e3:.0f} ms ({len(wav)} WAV bytes)")
    finally:
        proc.kill()
        proc.wait()


def run_streaming(ckpt, cfg, vckpt, vcfg):
    """Time-to-first-audio: chunked inference_truncated streaming
    (Synthesizer.tts_stream) vs the full-request path on the same long
    sentence (VERDICT r4 item 8). First chunk decodes 32 decoder steps of
    a 48-char chunk instead of the whole 124-step utterance."""
    from tts_tpu.infer.synthesizer import Synthesizer
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    synth = Synthesizer(ckpt, cfg, vckpt, vcfg)
    synth.tts(SENTENCE)                           # compile full path
    list(synth.tts_stream(SENTENCE, decoder_steps=32))  # compile chunks

    full_times, first_times, total_times = [], [], []
    for _ in range(5):
        t0 = time.time()
        wav_full = synth.tts(SENTENCE)
        full_times.append(time.time() - t0)

        t0 = time.time()
        first = None
        chunks = []
        for chunk in synth.tts_stream(SENTENCE, decoder_steps=32):
            if first is None:
                first = time.time() - t0
            chunks.append(chunk)
        total_times.append(time.time() - t0)
        first_times.append(first)
    audio_s = len(wav_full) / synth.ap.sample_rate
    stream_audio = sum(len(c) for c in chunks) / synth.ap.sample_rate
    print(f"[stream ] first audio {min(first_times)*1e3:.0f} ms "
          f"(full request {min(full_times)*1e3:.0f} ms for {audio_s:.2f}s "
          f"audio); streamed total {min(total_times)*1e3:.0f} ms / "
          f"{stream_audio:.2f}s in {len(chunks)} chunks")
    print(json.dumps({
        "metric": "first_audio_latency_ms",
        "streaming_ms": round(min(first_times) * 1e3, 1),
        "full_request_ms": round(min(full_times) * 1e3, 1),
        "chunks": len(chunks)}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    paths = build_models()
    if which in ("all", "cli"):
        run_cli(*paths, "cold1")
        run_cli(*paths, "cold2")
    if which in ("all", "steady"):
        run_inprocess(*paths)
    if which in ("all", "server"):
        run_server(*paths)
    if which in ("all", "streaming"):
        run_streaming(*paths)
