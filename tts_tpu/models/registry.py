"""TTS model factory from config (≙ setup_model,
/root/reference/TTS/tts/utils/generic_utils.py:48-134)."""

from __future__ import annotations

from typing import Any, Dict


def setup_model(num_chars: int, num_speakers: int, c: Dict[str, Any],
                speaker_embedding_dim: int = 0):
    name = c["model"].lower()
    # r_init must cover the LARGEST r in the gradual-training schedule: the
    # decoder heads are sized by r_init, so a checkpoint trained with
    # gradual r (7 -> 2) restores only into a model built the same way —
    # eval/serving rebuilds from config alone hit a ScopeParamShapeError
    # otherwise (caught by the round-5 real-LJSpeech gradual run)
    gradual = c.get("gradual_training") or []
    r_init = max([c.get("r", 7)] + [e[1] for e in gradual])
    common = dict(
        num_chars=num_chars,
        num_speakers=num_speakers,
        r=c.get("r", 7),
        r_init=r_init,
        prenet_type=c.get("prenet_type", "original"),
        prenet_dropout=c.get("prenet_dropout", True),
        attn_type=c.get("attention_type", "original"),
        attn_K=c.get("attention_heads", 5),
        location_attn=c.get("location_attn", True),
        use_forward_attn=c.get("use_forward_attn", False),
        use_transition_agent=c.get("transition_agent", False),
        forward_attn_mask=c.get("forward_attn_mask", False),
        windowing=c.get("windowing", False),
        separate_stopnet=c.get("separate_stopnet", True),
        use_gst=c.get("use_gst", False),
    )
    audio = c.get("audio", {})
    if name == "tacotron":
        from tts_tpu.models.tacotron import Tacotron
        return Tacotron(
            n_mels=audio.get("num_mels", 80),
            linear_dim=audio.get("fft_size", 1024) // 2 + 1,
            memory_size=c.get("memory_size", -1),
            attn_norm=c.get("attention_norm", "sigmoid"),
            max_decoder_steps=c.get("max_decoder_steps", 500),
            **common)
    if name == "tacotron2":
        from tts_tpu.models.tacotron2 import Tacotron2
        gst = c.get("gst", {}) or {}
        return Tacotron2(
            n_mels=audio.get("num_mels", 80),
            # size overrides (defaults = the reference's hard-coded sizes,
            # generic_utils.py:105-133); lets configs/tests scale the model
            encoder_dim=c.get("encoder_dim", 512),
            embedding_dim=c.get("embedding_dim", 512),
            attn_dim=c.get("attn_dim", 128),
            attn_norm=c.get("attention_norm", "softmax"),
            bidirectional_decoder=c.get("bidirectional_decoder", False),
            double_decoder_consistency=c.get("double_decoder_consistency", False),
            ddc_r=c.get("ddc_r", 6),
            external_speaker_dim=speaker_embedding_dim,
            gst_num_style_tokens=gst.get("gst_style_tokens", 10),
            gst_embedding_dim=gst.get("gst_embedding_dim", 512),
            gst_num_heads=gst.get("gst_num_heads", 4),
            max_decoder_steps=c.get("max_decoder_steps", 1000),
            **common)
    if name == "glow_tts":
        from tts_tpu.models.glow_tts import GlowTTS
        # glow hyperparameters follow the reference's setup_model defaults
        # (generic_utils.py:105-133, hard-coded there as well)
        return GlowTTS(
            num_chars=num_chars,
            num_speakers=num_speakers,
            out_channels=audio.get("num_mels", 80),
            hidden_channels_enc=c.get("hidden_channels_encoder", 192),
            hidden_channels_dec=c.get("hidden_channels_decoder", 192),
            encoder_type=c.get("encoder_type", "transformer"),
            rel_attn_window_size=4,
            mean_only=True,
            use_encoder_prenet=True,
        )
    raise KeyError(f"unknown model: {name}")
