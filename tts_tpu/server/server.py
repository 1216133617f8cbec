"""HTTP TTS server: demo page + GET /api/tts?text=... -> WAV bytes.

Capability parity with /root/reference/TTS/server/server.py:31-86 (Flask ->
stdlib ThreadingHTTPServer; same routes and query interface).
"""

from __future__ import annotations

import argparse
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from tts_tpu.audio.processor import wav_to_bytes

_DEMO_PAGE = """<!DOCTYPE html>
<html>
<head><title>tts_tpu demo</title></head>
<body style="font-family: sans-serif; max-width: 640px; margin: 40px auto;">
  <h1>tts_tpu</h1>
  <p>Type a sentence and press Speak.</p>
  <input id="text" size="60" value="Hello, world!"/>
  <button onclick="speak()">Speak</button>
  <p id="status"></p>
  <audio id="audio" controls></audio>
  <script>
    function speak() {
      const t = document.getElementById('text').value;
      document.getElementById('status').textContent = 'synthesizing...';
      const audio = document.getElementById('audio');
      audio.src = '/api/tts?text=' + encodeURIComponent(t);
      audio.onloadeddata = () => {
        document.getElementById('status').textContent = '';
        audio.play();
      };
    }
  </script>
</body>
</html>"""


def make_handler(synthesizer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _DEMO_PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/api/tts":
                qs = parse_qs(url.query)
                text = qs.get("text", [""])[0]
                if not text:
                    self.send_error(400, "missing text parameter")
                    return
                speaker = qs.get("speaker_id", [None])[0]
                try:
                    wav = synthesizer.tts(
                        text, speaker_id=int(speaker) if speaker else None)
                except Exception as e:  # surface synthesis errors as 500s
                    self.send_error(500, str(e))
                    return
                body = wav_to_bytes(wav, synthesizer.ap.sample_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/health":
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

    return Handler


def create_server(synthesizer, port: int = 5002) -> ThreadingHTTPServer:
    return ThreadingHTTPServer(("0.0.0.0", port), make_handler(synthesizer))


def embedded_model_paths():
    """(checkpoint, config) of a demo model shipped inside the wheel as
    ``tts_tpu/server/model/`` package data, or (None, None)
    (≙ reference server.py:31-63 + setup.py:89-103 wheel-embedded model)."""
    import glob
    import os
    model_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "model")
    ckpts = sorted(glob.glob(os.path.join(model_dir, "*.ckpt")))
    cfg = os.path.join(model_dir, "config.json")
    if ckpts and os.path.isfile(cfg):
        return ckpts[-1], cfg
    return None, None


def main(argv=None):
    from tts_tpu.parallel.mesh import initialize_multihost
    initialize_multihost()  # honors TTS_TPU_FORCE_CPU; no-op otherwise
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--tts_checkpoint", default=None,
                        help="defaults to the wheel-embedded demo model")
    parser.add_argument("--tts_config", default=None)
    parser.add_argument("--vocoder_checkpoint", default=None)
    parser.add_argument("--vocoder_config", default=None)
    parser.add_argument("--port", type=int, default=5002)
    parser.add_argument("--prewarm", action="store_true",
                        help="compile the serving graphs for every text "
                             "bucket at boot, before accepting requests — "
                             "moves the minutes-long first-request XLA "
                             "compile (persistent-cached thereafter) out of "
                             "user-visible latency")
    parser.add_argument("--exit-after-prewarm", action="store_true",
                        help="with --prewarm: exit 0 once every bucket is "
                             "compiled instead of serving. Use at "
                             "wheel-build / install time to produce a "
                             "persistent compilation cache; point "
                             "--cache-seed-out (or copy the cache dir) at "
                             "tts_tpu/server/cache_seed/ to ship it — new "
                             "machines then boot to first audio without "
                             "paying the tunnel compiles "
                             "(utils/jax_cache.py seeding)")
    parser.add_argument("--cache-seed-out", default=None,
                        help="after prewarm, copy the persistent cache "
                             "entries into this directory (a cache seed "
                             "artifact for packaging)")
    args = parser.parse_args(argv)

    if not args.tts_checkpoint:
        args.tts_checkpoint, args.tts_config = embedded_model_paths()
        if not args.tts_checkpoint:
            parser.error("--tts_checkpoint required (no embedded model found)")

    from tts_tpu.infer.synthesizer import Synthesizer

    synth = Synthesizer(args.tts_checkpoint, args.tts_config,
                        args.vocoder_checkpoint, args.vocoder_config)
    # --exit-after-prewarm / --cache-seed-out only make sense after a
    # prewarm; imply it so a packaging job can't silently fall through
    # into serve_forever()
    if args.exit_after_prewarm or args.cache_seed_out:
        args.prewarm = True
    if args.prewarm:
        synth.prewarm()
        if args.cache_seed_out:
            from tts_tpu.utils.jax_cache import export_cache
            n = export_cache(args.cache_seed_out)
            print(f" > Cache seed: {n} entries -> {args.cache_seed_out}",
                  flush=True)
        if args.exit_after_prewarm:
            print(" > Prewarm done, exiting (--exit-after-prewarm)",
                  flush=True)
            return
    server = create_server(synth, args.port)
    print(f" > Serving on http://localhost:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
