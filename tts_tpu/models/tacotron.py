"""Tacotron (v1): CBHG encoder/post-net, GRU decoder with memory queue,
linear-spectrogram output head.

Capability parity with /root/reference/TTS/tts/models/tacotron.py:10-172 and
/root/reference/TTS/tts/layers/tacotron.py (BatchNormConv1d l.7, Highway l.69,
CBHG l.104-205, Encoder l.226, PostCBHG l.248, Decoder with memory queue +
2x GRUCell l.264-495, StopNet l.498-514). Decoder is an nn.scan cell like
Tacotron2's; outputs both mel (decoder) and linear (post-CBHG head, 1025 bins).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.models.layers import Prenet, StopNet
from tts_tpu.ops.attention import init_attn
from tts_tpu.ops.masking import sequence_mask

Array = jnp.ndarray


class BatchNormConv1d(nn.Module):
    """conv -> (activation) -> batchnorm (≙ layers/tacotron.py:7-66; note the
    reference applies BN *after* the activation)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        y = nn.Conv(self.out_channels, (self.kernel_size,),
                    strides=(self.stride,), padding="SAME", use_bias=False,
                    name="conv")(x)
        if self.activation == "relu":
            y = nn.relu(y)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            name="bn")(y)


class Highway(nn.Module):
    """(≙ layers/tacotron.py:69-101)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(nn.Dense(self.features, name="H")(x))
        t = jax.nn.sigmoid(nn.Dense(
            self.features, bias_init=nn.initializers.constant(-1.0),
            name="T")(x))
        return h * t + x * (1.0 - t)


class CBHG(nn.Module):
    """Conv bank (k=1..K) + maxpool + projections + highway + BiGRU
    (≙ CBHG, layers/tacotron.py:104-205)."""

    in_features: int
    K: int = 16
    conv_bank_features: int = 128
    conv_projections: Tuple[int, ...] = (128, 128)
    highway_features: int = 128
    gru_features: int = 128
    num_highways: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        # conv bank: K parallel convs with kernel sizes 1..K
        bank = [
            BatchNormConv1d(self.conv_bank_features, k, activation="relu",
                            name=f"bank_{k}")(x, train)
            for k in range(1, self.K + 1)
        ]
        y = jnp.concatenate(bank, axis=-1)
        # NOTE: no max pooling — the reference's CBHG mentions it in a comment
        # but never instantiates or applies it (layers/tacotron.py:146,183-190)
        # conv projections
        for i, ch in enumerate(self.conv_projections):
            act = "relu" if i < len(self.conv_projections) - 1 else None
            y = BatchNormConv1d(ch, 3, activation=act,
                                name=f"proj_{i}")(y, train)
        # residual
        y = y + x
        if y.shape[-1] != self.highway_features:
            y = nn.Dense(self.highway_features, use_bias=False,
                         name="pre_highway")(y)
        for i in range(self.num_highways):
            y = Highway(self.highway_features, name=f"highway_{i}")(y)
        gru = nn.Bidirectional(
            nn.RNN(nn.GRUCell(self.gru_features), name="gru_fwd"),
            nn.RNN(nn.GRUCell(self.gru_features), name="gru_bwd"),
            name="bigru")
        return gru(y)


class TacotronEncoder(nn.Module):
    """Prenet + CBHG (≙ Encoder, layers/tacotron.py:226-245)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        y = Prenet((256, 128), name="prenet")(x, deterministic=not train)
        return CBHG(128, K=16, conv_projections=(128, 128), name="cbhg")(
            y, train)


class PostCBHG(nn.Module):
    """(≙ PostCBHG, layers/tacotron.py:248-261)."""

    mel_dim: int = 80

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        return CBHG(self.mel_dim, K=8, conv_bank_features=128,
                    conv_projections=(256, self.mel_dim),
                    highway_features=128, gru_features=128,
                    name="cbhg")(x, train)


class TacotronDecoderCell(nn.Module):
    """One r-frame decoder step: memory-queue prenet -> attention GRU ->
    2x residual GRU -> frame projection (≙ Decoder, layers/tacotron.py:264-495)."""

    n_mels: int = 80
    r: int = 7
    r_init: int = 0  # 0 -> r; fixes param shapes across gradual-training r
    memory_size: int = -1  # <=0: use the last r_init frames as query memory
    query_dim: int = 256
    prenet_type: str = "original"
    prenet_dropout: bool = True
    attn_type: str = "original"
    attn_dim: int = 128
    attn_K: int = 5
    location_attn: bool = True
    use_forward_attn: bool = False
    use_transition_agent: bool = False
    forward_attn_mask: bool = False
    attn_norm: str = "sigmoid"
    windowing: bool = False
    separate_stopnet: bool = True

    @property
    def use_memory_queue(self) -> bool:
        return self.memory_size > 0

    @property
    def memory_frames(self) -> int:
        """Prenet sees memory_size frames when the queue is on, else only
        the single last frame (≙ layers/tacotron.py:300-306)."""
        return self.memory_size if self.use_memory_queue else 1

    @property
    def memory_dim(self) -> int:
        return self.memory_frames * self.n_mels

    def setup(self):
        self.prenet = Prenet((256, 128), self.prenet_type,
                             self.prenet_dropout, name="prenet")
        self.attention_rnn = nn.GRUCell(self.query_dim, name="attention_rnn")
        self.attention = init_attn(
            self.attn_type, attn_dim=self.attn_dim, query_dim=self.query_dim,
            location_attention=self.location_attn, attn_K=self.attn_K,
            use_forward_attn=self.use_forward_attn,
            use_transition_agent=self.use_transition_agent,
            forward_attn_mask=self.forward_attn_mask, norm=self.attn_norm,
            windowing=self.windowing, use_v_bias=(self.attn_norm == "sigmoid"),
            name="attention")
        self.project_to_decoder_in = nn.Dense(256, name="project_to_decoder_in")
        self.decoder_rnns = [nn.GRUCell(256, name=f"decoder_rnn_{i}")
                             for i in range(2)]
        self.proj_to_mel = nn.Dense(max(self.r_init, self.r) * self.n_mels,
                                    name="proj_to_mel")
        self.stopnet = StopNet(name="stopnet")

    def __call__(self, carry: Dict[str, Any], memory_input: Array,
                 use_windowing: bool = False, deterministic: bool = False):
        prenet_out = self.prenet(memory_input, deterministic=deterministic)
        attn_rnn_state, query = self.attention_rnn(
            carry["attn_rnn"], jnp.concatenate(
                [prenet_out, carry["context"]], axis=-1))
        context, attn_state = self.attention(
            query, carry["inputs"], carry["processed_inputs"],
            carry["attn_state"], carry["mask"], use_windowing=use_windowing)
        dec_in = self.project_to_decoder_in(
            jnp.concatenate([query, context], axis=-1))
        rnn_states = []
        h = dec_in
        for i, cell in enumerate(self.decoder_rnns):
            state, out = cell(carry["dec_rnns"][i], h)
            h = h + out  # residual (layers/tacotron.py decoder residual adds)
            rnn_states.append(state)
        proj_full = self.proj_to_mel(h)
        # stopnet sees the FULL r_init projection; the emitted frames are
        # truncated to the current r afterwards (≙ layers/tacotron.py:405-414)
        stop_in = jnp.concatenate([h, proj_full], axis=-1)
        if self.separate_stopnet:
            stop_in = jax.lax.stop_gradient(stop_in)
        stop_logit = self.stopnet(stop_in, train=not deterministic)
        frames = proj_full[:, : self.r * self.n_mels]

        new_carry = dict(carry)
        new_carry.update(attn_rnn=attn_rnn_state, dec_rnns=tuple(rnn_states),
                         attn_state=attn_state, context=context)
        return new_carry, (frames, stop_logit, attn_state["attention_weights"])


class Tacotron(nn.Module):
    """(≙ Tacotron, models/tacotron.py:10-172): char embed 256 -> CBHG encoder
    -> r-frame GRU decoder (mel) -> PostCBHG -> linear head (1025 bins)."""

    num_chars: int = 200
    num_speakers: int = 1
    r: int = 7
    r_init: int = 0
    n_mels: int = 80
    linear_dim: int = 1025
    memory_size: int = -1
    speaker_embedding_dim: int = 256
    prenet_type: str = "original"
    prenet_dropout: bool = True
    attn_type: str = "original"
    attn_dim: int = 128
    attn_K: int = 5
    location_attn: bool = True
    use_forward_attn: bool = False
    use_transition_agent: bool = False
    forward_attn_mask: bool = False
    attn_norm: str = "sigmoid"
    windowing: bool = False
    separate_stopnet: bool = True
    use_gst: bool = False
    gst_embedding_dim: int = 256
    max_decoder_steps: int = 500
    stop_threshold: float = 0.5

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, 256,
                                  embedding_init=nn.initializers.normal(0.3),
                                  name="embedding")
        self.encoder = TacotronEncoder(name="encoder")
        self.decoder = TacotronDecoderCell(
            n_mels=self.n_mels, r=self.r, r_init=self.r_init,
            memory_size=self.memory_size,
            prenet_type=self.prenet_type, prenet_dropout=self.prenet_dropout,
            attn_type=self.attn_type, attn_dim=self.attn_dim,
            attn_K=self.attn_K, location_attn=self.location_attn,
            use_forward_attn=self.use_forward_attn,
            use_transition_agent=self.use_transition_agent,
            forward_attn_mask=self.forward_attn_mask,
            attn_norm=self.attn_norm, windowing=self.windowing,
            separate_stopnet=self.separate_stopnet, name="decoder")
        self.postnet = PostCBHG(self.n_mels, name="postnet")
        self.last_linear = nn.Dense(self.linear_dim, name="last_linear")
        if self.num_speakers > 1:
            self.speaker_embedding = nn.Embed(
                self.num_speakers, self.speaker_embedding_dim,
                name="speaker_embedding")
        if self.use_gst:
            from tts_tpu.models.gst import GST
            self.gst_layer = GST(num_mel=self.n_mels,
                                 gst_embedding_dim=self.gst_embedding_dim,
                                 name="gst_layer")

    def _encode(self, text, text_lengths, train, speaker_ids, style_mel):
        x = self.embedding(text)
        enc = self.encoder(x, train=train)
        parts = [enc]
        if self.num_speakers > 1 and speaker_ids is not None:
            spk = self.speaker_embedding(speaker_ids)
            parts.append(jnp.broadcast_to(
                spk[:, None, :], (enc.shape[0], enc.shape[1], spk.shape[-1])))
        if self.use_gst and style_mel is not None:
            style = self.gst_layer(style_mel, train=train)
            parts.append(jnp.broadcast_to(
                style[:, None, :],
                (enc.shape[0], enc.shape[1], style.shape[-1])))
        if len(parts) > 1:
            enc = jnp.concatenate(parts, axis=-1)
        mask = sequence_mask(text_lengths, enc.shape[1])
        return enc, mask

    def _init_carry(self, enc, mask):
        B, T_in, D = enc.shape
        return {
            "inputs": enc,
            "processed_inputs": self.decoder.attention.preprocess_inputs(enc),
            "mask": mask,
            "attn_rnn": jnp.zeros((B, self.decoder.query_dim)),
            "dec_rnns": (jnp.zeros((B, 256)), jnp.zeros((B, 256))),
            "attn_state": self.decoder.attention.init_state(B, T_in),
            "context": jnp.zeros((B, D)),
        }

    def _memory_inputs(self, mel: Array) -> Array:
        """Teacher-forcing memory inputs, replicating the reference's update
        rule exactly (layers/tacotron.py:416-432): step 0 sees zeros; step t
        sees, without queue, the LAST frame of group t-1; with a queue of M
        frames, the newest groups first — cat(g[t-1], g[t-2], ...)[:M*C]
        (note: for M <= r this is the OLDEST M frames of group t-1, a
        reference quirk kept for checkpoint parity)."""
        B, T_mel, C = mel.shape
        r = self.r
        n_steps = T_mel // r
        groups = mel[:, : n_steps * r].reshape(B, n_steps, r * C)
        dec = self.decoder
        if not dec.use_memory_queue:
            prev_last = groups[:, :, (r - 1) * C:]          # (B, steps, C)
            mem = jnp.concatenate(
                [jnp.zeros((B, 1, C), mel.dtype), prev_last[:, :-1]], axis=1)
            return jnp.swapaxes(mem, 0, 1)
        M = dec.memory_size
        njq = -(-M // r)  # groups needed
        shifted = []
        for j in range(1, njq + 1):
            sj = jnp.pad(groups, ((0, 0), (j, 0), (0, 0)))[:, :n_steps]
            shifted.append(sj)
        mem = jnp.concatenate(shifted, axis=-1)[:, :, : M * C]
        return jnp.swapaxes(mem, 0, 1)

    def __call__(self, text: Array, text_lengths: Array, mel: Array,
                 mel_lengths: Optional[Array] = None,
                 speaker_ids: Optional[Array] = None,
                 speaker_embeddings: Optional[Array] = None,
                 train: bool = True) -> Dict[str, Array]:
        del speaker_embeddings
        B, T_mel, _ = mel.shape
        n_steps = T_mel // self.r
        enc, mask = self._encode(text, text_lengths, train, speaker_ids,
                                 mel if self.use_gst else None)
        memory = self._memory_inputs(mel)
        scan = nn.scan(lambda mdl, c, x: mdl(c, x, False, not train),
                       variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0)
        _, (frames, stop_logits, alignments) = scan(
            self.decoder, self._init_carry(enc, mask), memory)
        decoder_outputs = jnp.swapaxes(frames, 0, 1).reshape(
            B, n_steps * self.r, self.n_mels)
        post = self.postnet(decoder_outputs, train=train)
        linear = self.last_linear(post)
        return {
            "decoder_outputs": decoder_outputs,
            "postnet_outputs": linear,
            "alignments": jnp.swapaxes(alignments, 0, 1),
            "stop_logits": jnp.swapaxes(stop_logits, 0, 1),
        }

    def inference(self, text: Array, text_lengths: Optional[Array] = None,
                  speaker_ids: Optional[Array] = None,
                  style_mel: Optional[Array] = None,
                  max_decoder_steps: Optional[int] = None,
                  use_windowing: bool = True) -> Dict[str, Array]:
        B = text.shape[0]
        if text_lengths is None:
            text_lengths = jnp.full((B,), text.shape[1], jnp.int32)
        n_steps = max_decoder_steps or self.max_decoder_steps
        enc, mask = self._encode(text, text_lengths, False, speaker_ids,
                                 style_mel)
        carry = self._init_carry(enc, mask)
        carry["memory"] = jnp.zeros((B, self.decoder.memory_dim))
        carry["done"] = jnp.zeros((B,), dtype=bool)
        carry["n_steps_done"] = jnp.zeros((B,), jnp.int32)

        def step(mdl, carry, _):
            inner = {k: v for k, v in carry.items()
                     if k not in ("memory", "done", "n_steps_done")}
            new_inner, (frames, stop_logit, align) = mdl(
                inner, carry["memory"], use_windowing, True)
            done_now = jax.nn.sigmoid(stop_logit) > self.stop_threshold
            new_carry = dict(new_inner)
            new_carry["done"] = carry["done"] | done_now
            new_carry["n_steps_done"] = carry["n_steps_done"] + (
                ~carry["done"]).astype(jnp.int32)
            # memory update (≙ _update_memory_input, layers/tacotron.py:416)
            dec, C = self.decoder, self.n_mels
            if not dec.use_memory_queue:
                new_carry["memory"] = frames[:, (dec.r - 1) * C:]
            elif dec.memory_size <= dec.r:
                new_carry["memory"] = frames[:, : dec.memory_size * C]
            else:
                new_carry["memory"] = jnp.concatenate(
                    [frames, carry["memory"][:, : (dec.memory_size - dec.r) * C]],
                    axis=-1)
            return new_carry, (frames, stop_logit, align, ~carry["done"])

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0, length=n_steps)
        final, (frames, stop_logits, alignments, active) = scan(
            self.decoder, carry, None)
        decoder_outputs = jnp.swapaxes(frames, 0, 1).reshape(
            B, n_steps * self.r, self.n_mels)
        active = jnp.swapaxes(active, 0, 1)
        fmask = jnp.repeat(active, self.r, axis=1)[..., None]
        decoder_outputs = decoder_outputs * fmask
        linear = self.last_linear(self.postnet(decoder_outputs, train=False))
        return {
            "decoder_outputs": decoder_outputs,
            "postnet_outputs": linear * fmask,
            "alignments": jnp.swapaxes(alignments, 0, 1),
            "stop_logits": jnp.swapaxes(stop_logits, 0, 1),
            "mel_lengths": final["n_steps_done"] * self.r,
        }
