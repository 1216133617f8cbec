"""Integration smoke tests: tiny end-to-end training + resume + synthesis +
server (≙ reference tests/test_tts_train.sh, test_demo_server.py)."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from tests.fixtures import SR, make_ljspeech_fixture
from tts_tpu.config import AttrDict


def _config(lj_root, out_path):
    return AttrDict({
        "model": "tacotron2",
        "run_name": "smoke",
        "audio": {
            "sample_rate": SR, "num_mels": 80, "fft_size": 1024,
            "hop_length": 256, "win_length": 1024, "preemphasis": 0.0,
            "min_level_db": -100, "ref_level_db": 20, "power": 1.5,
            "griffin_lim_iters": 10, "signal_norm": True,
            "symmetric_norm": True, "max_norm": 4.0, "clip_norm": True,
            "mel_fmin": 0.0, "mel_fmax": 8000.0, "do_trim_silence": False,
        },
        "batch_size": 2, "eval_batch_size": 2, "r": 2,
        "loss_masking": True, "run_eval": True, "test_delay_epochs": 0,
        "print_step": 1, "save_step": 2, "checkpoint": True,
        "grad_clip": 1.0, "epochs": 1, "lr": 1e-3, "seq_len_norm": False,
        "use_phonemes": False, "text_cleaner": "english_cleaners",
        "num_speakers": 1,
        # tiny model so the smoke test compiles fast
        "max_decoder_steps": 30,
        "datasets": [{"name": "ljspeech", "path": lj_root,
                      "meta_file_train": "metadata.csv"}],
        "output_path": out_path,
    })


@pytest.fixture(scope="module")
def lj_root(tmp_path_factory):
    return make_ljspeech_fixture(str(tmp_path_factory.mktemp("lj")), n_items=6)


@pytest.fixture(scope="module")
def trained(lj_root, tmp_path_factory):
    """Train 1 epoch on the fixture; shared by downstream tests."""
    from tts_tpu.train.trainer_tts import TTSTrainer

    out = str(tmp_path_factory.mktemp("run"))
    c = _config(lj_root, out)
    trainer = TTSTrainer(c, out)
    trainer.fit()
    ckpt = trainer.save_checkpoint()
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(dict(c), f, default=str)
    return {"trainer": trainer, "ckpt": ckpt, "out": out, "config": c}


class TestTrainSmoke:
    def test_one_epoch_runs(self, trained):
        t = trained["trainer"]
        assert t.global_step >= 2
        assert os.path.isfile(trained["ckpt"])
        assert os.path.isfile(os.path.join(trained["out"], "best_model.ckpt"))

    def test_continue_from_checkpoint(self, trained, lj_root, tmp_path):
        """≙ the reference's continue-path re-run (test_tts_train.sh:10-13)."""
        from tts_tpu.train.trainer_tts import TTSTrainer
        from tts_tpu.train.checkpoint import latest_checkpoint

        c = _config(lj_root, trained["out"])
        trainer2 = TTSTrainer(c, trained["out"])
        trainer2.restore(latest_checkpoint(trained["out"]))
        start_step = trainer2.global_step
        assert start_step >= 2
        trainer2.train_epoch()
        assert trainer2.global_step > start_step

    def test_restore_partial(self, trained, lj_root):
        from tts_tpu.train.trainer_tts import TTSTrainer

        c = _config(lj_root, trained["out"])
        trainer = TTSTrainer(c, trained["out"])
        trainer.restore(trained["ckpt"], reinit_layers=["postnet"])
        trainer.train_epoch()
        assert trainer.global_step > 0


class TestSynthesisSmoke:
    def test_synthesis_pipeline(self, trained):
        from tts_tpu.infer.synthesis import synthesis

        t = trained["trainer"]
        variables = {"params": t.state.params,
                     "batch_stats": t.state.batch_stats}
        model = t.model.clone(r=t.r)
        result = synthesis(model, variables, "hello world.",
                           trained["config"], t.ap,
                           max_decoder_steps=10)
        assert "wav" in result and len(result["wav"]) > 0
        assert np.isfinite(result["wav"]).all()

    def test_synthesizer_class(self, trained):
        from tts_tpu.infer.synthesizer import Synthesizer

        synth = Synthesizer(trained["ckpt"],
                            os.path.join(trained["out"], "config.json"))
        wav = synth.tts("hi there. bye now.")
        assert len(wav) > 10000
        assert np.isfinite(wav).all()

    def test_prewarm(self, trained):
        """server --prewarm path: compiles bucket graphs up front."""
        from tts_tpu.infer.synthesis import _JIT_CACHE
        from tts_tpu.infer.synthesizer import Synthesizer

        synth = Synthesizer(trained["ckpt"],
                            os.path.join(trained["out"], "config.json"))
        before = len(_JIT_CACHE)
        synth.prewarm(buckets=[32])
        wav = synth.tts("warm request.")
        assert len(wav) > 0 and np.isfinite(wav).all()
        assert len(_JIT_CACHE) >= max(before, 1)


class TestServerSmoke:
    def test_http_roundtrip(self, trained):
        from tts_tpu.infer.synthesizer import Synthesizer
        from tts_tpu.server.server import create_server

        synth = Synthesizer(trained["ckpt"],
                            os.path.join(trained["out"], "config.json"))
        server = create_server(synth, port=0)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            with urllib.request.urlopen(
                    f"http://localhost:{port}/health") as r:
                assert json.loads(r.read())["status"] == "ok"
            with urllib.request.urlopen(
                    f"http://localhost:{port}/") as r:
                assert b"tts_tpu" in r.read()
            with urllib.request.urlopen(
                    f"http://localhost:{port}/api/tts?text=hello") as r:
                wav_bytes = r.read()
                assert r.headers["Content-Type"] == "audio/wav"
                assert wav_bytes[:4] == b"RIFF"
        finally:
            server.shutdown()


class TestComputeStatistics:
    def test_stats_file(self, lj_root, tmp_path):
        from tts_tpu.bin.compute_statistics import compute_statistics

        c = _config(lj_root, str(tmp_path))
        out = str(tmp_path / "scale_stats.npy")
        stats = compute_statistics(c, out)
        assert os.path.isfile(out)
        assert stats["mel_mean"].shape == (80,)
        assert (stats["mel_std"] > 0).all()
        # stats file usable by the AudioProcessor
        from tts_tpu.audio import AudioProcessor
        cfg = dict(c["audio"])
        cfg["stats_path"] = out
        ap = AudioProcessor(**cfg)
        assert ap.mel_scaler is not None


class TestWaveRNNHopValidation:
    def test_hop_mismatch_raises_at_load(self, trained, tmp_path):
        """ADVICE r3 (medium): a WaveRNN whose upsample product disagrees
        with the vocoder audio hop_length must fail loudly at Synthesizer
        load, not silently mis-trim audio."""
        import json

        import jax
        import jax.numpy as jnp
        import pytest as _pytest

        from tts_tpu.infer.synthesizer import Synthesizer
        from tts_tpu.models.vocoder.wavernn import WaveRNN
        from tts_tpu.train.checkpoint import save_checkpoint

        gen = WaveRNN(bits=8, rnn_dims=16, fc_dims=16, feat_dims=80,
                      compute_dims=16, res_out_dims=16, res_blocks=1,
                      pad=2, upsample_factors=(2, 2))  # hop 4 != 256
        rng = jax.random.PRNGKey(0)
        v = gen.init(rng, jnp.zeros((1, 2 * 4)), jnp.zeros((1, 6, 80)))
        voc_dir = tmp_path / "wavernn_bad"
        ckpt = save_checkpoint(str(voc_dir), params=v["params"],
                               batch_stats=v.get("batch_stats"), step=1)
        cfg = json.load(open(os.path.join(trained["out"], "config.json")))
        voc_cfg = {
            "generator_model": "wavernn",
            "generator_model_params": {
                "bits": 8, "rnn_dims": 16, "fc_dims": 16,
                "compute_dims": 16, "res_out_dims": 16, "res_blocks": 1,
                "pad": 2, "upsample_factors": [2, 2]},
            "audio": cfg["audio"],  # hop_length 256
        }
        cfg_path = voc_dir / "config.json"
        with open(cfg_path, "w") as f:
            json.dump(voc_cfg, f)
        with _pytest.raises(ValueError, match="hop_length"):
            Synthesizer(trained["ckpt"],
                        os.path.join(trained["out"], "config.json"),
                        str(ckpt), str(cfg_path))
