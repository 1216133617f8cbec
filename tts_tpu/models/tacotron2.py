"""Tacotron2: conv+BiLSTM encoder, scan-carried autoregressive decoder, postnet.

TPU-native re-design of /root/reference/TTS/tts/models/tacotron2.py:9-189 and
/root/reference/TTS/tts/layers/tacotron2.py:123-423. The reference's Python
``while`` decoder loop (layers/tacotron2.py:300-374) becomes:

- training: ``nn.scan`` over T_mel / r teacher-forced steps (one compiled
  program; all state — LSTM cells, attention weights, context — in the carry);
- inference: ``nn.scan`` over a *static* step budget with a ``done`` flag
  carried per example (stopnet threshold 0.5, ≙ max_decoder_steps semantics)
  so batching stays static-shape; outputs beyond stop are masked.

Supports r>1 reduction (r frames per step), variable r via ``set_r`` at the
config level (shapes are static per compiled bucket), speaker conditioning,
double decoder consistency (coarse second decoder, ≙ tacotron_abstract.py:149-166),
and bidirectional decoder training.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.ops.attention import init_attn
from tts_tpu.ops.masking import sequence_mask
from tts_tpu.models.layers import Postnet, Prenet, StopNet, Tacotron2Encoder

Array = jnp.ndarray


class DecoderCell(nn.Module):
    """One decoder step: prenet -> attention LSTM -> attention -> decoder LSTM
    -> frame projection + stopnet (≙ Decoder.decode, layers/tacotron2.py:259-298)."""

    n_mels: int = 80
    r: int = 7
    r_init: int = 0  # 0 -> use r; set to the max schedule r for gradual training
    encoder_dim: int = 512
    query_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_type: str = "original"
    prenet_dropout: bool = True
    attn_type: str = "original"
    attn_dim: int = 128
    attn_K: int = 5
    location_attn: bool = True
    use_forward_attn: bool = False
    use_transition_agent: bool = False
    forward_attn_mask: bool = False
    attn_norm: str = "softmax"
    windowing: bool = False
    separate_stopnet: bool = True

    def setup(self):
        # bias-free prenet (≙ Prenet(..., bias=False), layers/tacotron2.py:170-175)
        self.prenet = Prenet((256, 256), self.prenet_type, self.prenet_dropout,
                             use_bias=False, name="prenet")
        self.attention_rnn = nn.OptimizedLSTMCell(self.query_dim,
                                                  name="attention_rnn")
        self.attention = init_attn(
            self.attn_type, attn_dim=self.attn_dim, query_dim=self.query_dim,
            location_attention=self.location_attn, attn_K=self.attn_K,
            use_forward_attn=self.use_forward_attn,
            use_transition_agent=self.use_transition_agent,
            forward_attn_mask=self.forward_attn_mask, norm=self.attn_norm,
            windowing=self.windowing, name="attention")
        self.decoder_rnn = nn.OptimizedLSTMCell(self.decoder_rnn_dim,
                                                name="decoder_rnn")
        # sized by r_init and sliced to the active r, so params survive
        # gradual-training r changes (≙ r_init sizing + runtime slice,
        # layers/tacotron2.py linear_projection / set_r)
        self.linear_projection = nn.Dense(
            max(self.r_init, self.r) * self.n_mels, name="linear_projection")
        self.stopnet = StopNet(name="stopnet")
        self.query_dropout = nn.Dropout(0.1)
        self.decoder_dropout = nn.Dropout(0.1)

    def __call__(self, carry: Dict[str, Any], memory_input: Array,
                 use_windowing: bool = False, deterministic: bool = False
                 ) -> Tuple[Dict[str, Any], Tuple[Array, Array, Array]]:
        inputs = carry["inputs"]
        processed_inputs = carry["processed_inputs"]
        mask = carry["mask"]

        prenet_out = self.prenet(memory_input, deterministic=deterministic)
        cell_input = jnp.concatenate([prenet_out, carry["context"]], axis=-1)
        attn_rnn_state, query = self.attention_rnn(carry["attn_rnn"], cell_input)
        query = self.query_dropout(query, deterministic=deterministic)
        # the reference also drops out the attention-rnn cell state
        # (layers/tacotron2.py:274-277)
        attn_rnn_state = (self.query_dropout(attn_rnn_state[0],
                                             deterministic=deterministic),
                          query)

        context, attn_state = self.attention(
            query, inputs, processed_inputs, carry["attn_state"], mask,
            use_windowing=use_windowing)

        dec_input = jnp.concatenate([query, context], axis=-1)
        dec_rnn_state, dec_out = self.decoder_rnn(carry["dec_rnn"], dec_input)
        dec_out = self.decoder_dropout(dec_out, deterministic=deterministic)
        # carry the dropped-out hidden (≙ self.decoder_hidden reuse,
        # layers/tacotron2.py:283-286)
        dec_rnn_state = (dec_rnn_state[0], dec_out)

        proj_input = jnp.concatenate([dec_out, context], axis=-1)
        frames_full = self.linear_projection(proj_input)  # r_init * n_mels

        # stopnet sees the FULL r_init-sized projection (layers/tacotron2.py:
        # 293-300 slices to r only after the stopnet input is formed)
        stop_input = jnp.concatenate([dec_out, frames_full], axis=-1)
        if self.separate_stopnet:
            # stopnet trains on its own loss; block gradients into the decoder
            # (≙ separate_stopnet, models/tacotron2.py stop_token detach)
            stop_input = jax.lax.stop_gradient(stop_input)
        stop_logit = self.stopnet(stop_input, train=not deterministic)
        frames = frames_full[:, : self.r * self.n_mels]

        new_carry = dict(carry)
        new_carry.update(attn_rnn=attn_rnn_state, dec_rnn=dec_rnn_state,
                         attn_state=attn_state, context=context)
        return new_carry, (frames, stop_logit, attn_state["attention_weights"])


class Tacotron2(nn.Module):
    """Full model (≙ Tacotron2, models/tacotron2.py:9-189)."""

    num_chars: int = 200
    num_speakers: int = 1
    n_mels: int = 80
    r: int = 7
    r_init: int = 0
    encoder_dim: int = 512
    embedding_dim: int = 512
    speaker_embedding_dim: int = 64
    external_speaker_dim: int = 0  # if >0, expects external d-vectors
    prenet_type: str = "original"
    prenet_dropout: bool = True
    attn_type: str = "original"
    attn_dim: int = 128
    attn_K: int = 5
    location_attn: bool = True
    use_forward_attn: bool = False
    use_transition_agent: bool = False
    forward_attn_mask: bool = False
    attn_norm: str = "softmax"
    windowing: bool = False
    separate_stopnet: bool = True
    bidirectional_decoder: bool = False
    double_decoder_consistency: bool = False
    ddc_r: int = 6
    use_gst: bool = False
    gst_num_style_tokens: int = 10
    gst_embedding_dim: int = 512
    gst_num_heads: int = 4
    max_decoder_steps: int = 1000
    stop_threshold: float = 0.5

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, self.embedding_dim,
                                  embedding_init=nn.initializers.normal(0.3),
                                  name="embedding")
        self.encoder = Tacotron2Encoder(self.encoder_dim, name="encoder")
        dec_kwargs = dict(
            n_mels=self.n_mels, encoder_dim=self._decoder_in_dim(),
            prenet_type=self.prenet_type, prenet_dropout=self.prenet_dropout,
            attn_type=self.attn_type, attn_dim=self.attn_dim, attn_K=self.attn_K,
            location_attn=self.location_attn,
            use_forward_attn=self.use_forward_attn,
            use_transition_agent=self.use_transition_agent,
            forward_attn_mask=self.forward_attn_mask, attn_norm=self.attn_norm,
            windowing=self.windowing, separate_stopnet=self.separate_stopnet)
        self.decoder = DecoderCell(r=self.r, r_init=self.r_init,
                                   name="decoder", **dec_kwargs)
        if self.double_decoder_consistency:
            self.coarse_decoder = DecoderCell(r=self.ddc_r, name="coarse_decoder",
                                              **dec_kwargs)
        if self.bidirectional_decoder:
            self.backward_decoder = DecoderCell(r=self.r, r_init=self.r_init,
                                                name="backward_decoder",
                                                **dec_kwargs)
        self.postnet = Postnet(self.n_mels, name="postnet")
        if self.num_speakers > 1 and self.external_speaker_dim == 0:
            self.speaker_embedding = nn.Embed(
                self.num_speakers, self.speaker_embedding_dim,
                name="speaker_embedding")
        if self.use_gst:
            from tts_tpu.models.gst import GST
            self.gst_layer = GST(
                num_mel=self.n_mels,
                num_heads=self.gst_num_heads,
                num_style_tokens=self.gst_num_style_tokens,
                gst_embedding_dim=self.gst_embedding_dim,
                name="gst_layer")

    def _decoder_in_dim(self) -> int:
        d = self.encoder_dim
        if self.num_speakers > 1:
            d += (self.external_speaker_dim
                  if self.external_speaker_dim > 0 else self.speaker_embedding_dim)
        if self.use_gst:
            d += self.gst_embedding_dim
        return d

    # -- shared helpers ----------------------------------------------------

    def _encode(self, text: Array, text_lengths: Array, train: bool,
                speaker_ids: Optional[Array],
                speaker_embeddings: Optional[Array],
                style_mel: Optional[Array],
                mask_embeddings: bool = False) -> Tuple[Array, Array]:
        x = self.embedding(text)
        # mask_embeddings: serving's text-length bucketing — zero every pad
        # position through the conv stack so the bucketed run is bit-equal
        # to the unpadded one (see Tacotron2Encoder.mask_pads); the BiLSTM
        # is already length-exact via flax seq_lengths reversal
        enc = self.encoder(x, text_lengths, train=train,
                           mask_pads=mask_embeddings)
        parts = [enc]
        if self.num_speakers > 1:
            if self.external_speaker_dim > 0:
                spk = speaker_embeddings
            else:
                spk = self.speaker_embedding(speaker_ids)
            parts.append(jnp.broadcast_to(spk[:, None, :],
                                          (enc.shape[0], enc.shape[1], spk.shape[-1])))
        if self.use_gst:
            style = self.gst_layer(style_mel, train=train)  # (B, gst_dim)
            parts.append(jnp.broadcast_to(style[:, None, :],
                                          (enc.shape[0], enc.shape[1], style.shape[-1])))
        if len(parts) > 1:
            enc = jnp.concatenate(parts, axis=-1)
        mask = sequence_mask(text_lengths, enc.shape[1])
        return enc, mask

    def _init_carry(self, decoder: DecoderCell, enc: Array, mask: Array
                    ) -> Dict[str, Any]:
        B, T_in, D = enc.shape
        # carried activations follow the encoder dtype so bf16-cast params
        # give a bf16 decode (attention state stays f32 inside the module)
        dt = enc.dtype
        zeros = jnp.zeros((B, decoder.query_dim), dt)
        zeros_dec = jnp.zeros((B, decoder.decoder_rnn_dim), dt)
        return {
            "inputs": enc,
            "processed_inputs": decoder.attention.preprocess_inputs(enc),
            "mask": mask,
            "attn_rnn": (zeros, zeros),
            "dec_rnn": (zeros_dec, zeros_dec),
            "attn_state": decoder.attention.init_state(B, T_in),
            "context": jnp.zeros((B, D), dt),
        }

    def _run_decoder(self, decoder: DecoderCell, enc: Array, mask: Array,
                     mel: Array, r: int, train: bool = True
                     ) -> Tuple[Array, Array, Array]:
        """Teacher-forced scan. mel: (B, T_mel, n_mels), T_mel % r == 0."""
        B, T_mel, _ = mel.shape
        n_steps = T_mel // r
        # memory inputs: go-frame then the last frame of each r-group
        tf_frames = mel[:, r - 1:: r, :][:, : n_steps - 1, :]
        memory = jnp.concatenate(
            [jnp.zeros((B, 1, self.n_mels)), tf_frames], axis=1)
        memory = jnp.swapaxes(memory, 0, 1)  # (steps, B, n_mels)

        scan = nn.scan(
            lambda mdl, c, x: mdl(c, x, False, not train),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0)
        carry = self._init_carry(decoder, enc, mask)
        _, (frames, stop_logits, alignments) = scan(decoder, carry, memory)
        # frames: (steps, B, r * n_mels) -> (B, steps*r, n_mels)
        frames = jnp.swapaxes(frames, 0, 1).reshape(B, n_steps * r, self.n_mels)
        stop_logits = jnp.swapaxes(stop_logits, 0, 1)       # (B, steps)
        alignments = jnp.swapaxes(alignments, 0, 1)         # (B, steps, T_in)
        return frames, stop_logits, alignments

    # -- training forward --------------------------------------------------

    def __call__(self, text: Array, text_lengths: Array, mel: Array,
                 mel_lengths: Optional[Array] = None,
                 speaker_ids: Optional[Array] = None,
                 speaker_embeddings: Optional[Array] = None,
                 train: bool = True) -> Dict[str, Array]:
        style_mel = mel if self.use_gst else None
        enc, mask = self._encode(text, text_lengths, train, speaker_ids,
                                 speaker_embeddings, style_mel)
        decoder_outputs, stop_logits, alignments = self._run_decoder(
            self.decoder, enc, mask, mel, self.r, train=train)
        postnet_outputs = decoder_outputs + self.postnet(decoder_outputs,
                                                         train=train)
        out = {
            "decoder_outputs": decoder_outputs,
            "postnet_outputs": postnet_outputs,
            "alignments": alignments,
            "stop_logits": stop_logits,
        }
        if self.double_decoder_consistency:
            # coarse pass with bigger r on the same targets
            # (≙ _coarse_decoder_pass, tacotron_abstract.py:149-166)
            T_mel = mel.shape[1]
            pad = (self.ddc_r - T_mel % self.ddc_r) % self.ddc_r
            mel_c = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
            frames_c, _, align_c = self._run_decoder(
                self.coarse_decoder, enc, mask, mel_c, self.ddc_r, train=train)
            out["coarse_decoder_outputs"] = frames_c[:, :T_mel]
            out["coarse_alignments"] = align_c
        if self.bidirectional_decoder:
            # second decoder consuming time-reversed targets
            # (≙ _backward_pass, tacotron_abstract.py:141-147)
            mel_rev = jnp.flip(mel, axis=1)
            frames_b, _, align_b = self._run_decoder(
                self.backward_decoder, enc, mask, mel_rev, self.r, train=train)
            out["backward_decoder_outputs"] = jnp.flip(frames_b, axis=1)
            out["backward_alignments"] = align_b
        return out

    # -- inference ---------------------------------------------------------

    def inference(self, text: Array, text_lengths: Optional[Array] = None,
                  speaker_ids: Optional[Array] = None,
                  speaker_embeddings: Optional[Array] = None,
                  style_mel: Optional[Array] = None,
                  max_decoder_steps: Optional[int] = None,
                  use_windowing: bool = True) -> Dict[str, Array]:
        """Autoregressive decode with static step budget and stop masking."""
        B = text.shape[0]
        if text_lengths is None:
            text_lengths = jnp.full((B,), text.shape[1], dtype=jnp.int32)
        n_steps = max_decoder_steps or self.max_decoder_steps
        enc, mask = self._encode(text, text_lengths, False, speaker_ids,
                                 speaker_embeddings, style_mel,
                                 mask_embeddings=True)

        carry = self._init_carry(self.decoder, enc, mask)
        carry["last_frame"] = jnp.zeros((B, self.n_mels), enc.dtype)
        carry["done"] = jnp.zeros((B,), dtype=bool)
        carry["n_steps_done"] = jnp.zeros((B,), dtype=jnp.int32)

        decoder = self.decoder

        def step(mdl, carry, _):
            inner = {k: v for k, v in carry.items()
                     if k not in ("last_frame", "done", "n_steps_done")}
            new_inner, (frames, stop_logit, align) = mdl(
                inner, carry["last_frame"], use_windowing, True)
            done_now = jax.nn.sigmoid(stop_logit) > self.stop_threshold
            new_carry = dict(new_inner)
            new_carry["done"] = carry["done"] | done_now
            new_carry["n_steps_done"] = carry["n_steps_done"] + (
                ~carry["done"]).astype(jnp.int32)
            new_carry["last_frame"] = frames[:, -self.n_mels:]
            active = ~carry["done"]
            return new_carry, (frames, stop_logit, align, active)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0, length=n_steps)
        final, (frames, stop_logits, alignments, active) = scan(
            decoder, carry, None)

        frames = jnp.swapaxes(frames, 0, 1).reshape(B, n_steps * self.r,
                                                    self.n_mels)
        active = jnp.swapaxes(active, 0, 1)  # (B, steps) True while decoding
        frame_mask = jnp.repeat(active, self.r, axis=1)[..., None]
        frames = frames * frame_mask
        postnet_outputs = frames + self.postnet(frames, train=False)
        postnet_outputs = postnet_outputs * frame_mask
        return {
            "decoder_outputs": frames,
            "postnet_outputs": postnet_outputs,
            "alignments": jnp.swapaxes(alignments, 0, 1),
            "stop_logits": jnp.swapaxes(stop_logits, 0, 1),
            "mel_lengths": final["n_steps_done"] * self.r,
        }

    def inference_truncated(self, text: Array,
                            text_lengths: Optional[Array] = None,
                            decoder_state: Optional[Dict[str, Any]] = None,
                            speaker_ids: Optional[Array] = None,
                            speaker_embeddings: Optional[Array] = None,
                            style_mel: Optional[Array] = None,
                            max_decoder_steps: Optional[int] = None
                            ) -> Dict[str, Array]:
        """Streaming decode: RNN states/context/last-frame persist across
        calls while attention state re-inits for each text chunk
        (≙ inference_truncated, models/tacotron2.py:165-189 +
        layers/tacotron2.py:376-409 keep_states semantics).

        Returns the usual outputs plus 'decoder_state' to thread into the
        next call.
        """
        B = text.shape[0]
        if text_lengths is None:
            text_lengths = jnp.full((B,), text.shape[1], dtype=jnp.int32)
        n_steps = max_decoder_steps or self.max_decoder_steps
        enc, mask = self._encode(text, text_lengths, False, speaker_ids,
                                 speaker_embeddings, style_mel,
                                 mask_embeddings=True)
        carry = self._init_carry(self.decoder, enc, mask)
        carry["last_frame"] = jnp.zeros((B, self.n_mels))
        carry["done"] = jnp.zeros((B,), dtype=bool)
        carry["n_steps_done"] = jnp.zeros((B,), dtype=jnp.int32)
        if decoder_state is not None:
            carry["attn_rnn"] = decoder_state["attn_rnn"]
            carry["dec_rnn"] = decoder_state["dec_rnn"]
            carry["last_frame"] = decoder_state["last_frame"]
            # context dim matches only when speaker/GST conditioning is equal
            carry["context"] = decoder_state["context"]

        decoder = self.decoder

        def step(mdl, carry, _):
            inner = {k: v for k, v in carry.items()
                     if k not in ("last_frame", "done", "n_steps_done")}
            new_inner, (frames, stop_logit, align) = mdl(
                inner, carry["last_frame"], False, True)
            done_now = jax.nn.sigmoid(stop_logit) > self.stop_threshold
            new_carry = dict(new_inner)
            new_carry["done"] = carry["done"] | done_now
            new_carry["n_steps_done"] = carry["n_steps_done"] + (
                ~carry["done"]).astype(jnp.int32)
            new_carry["last_frame"] = frames[:, -self.n_mels:]
            return new_carry, (frames, stop_logit, align, ~carry["done"])

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0, length=n_steps)
        final, (frames, stop_logits, alignments, active) = scan(
            decoder, carry, None)
        frames = jnp.swapaxes(frames, 0, 1).reshape(B, n_steps * self.r,
                                                    self.n_mels)
        active = jnp.swapaxes(active, 0, 1)
        frame_mask = jnp.repeat(active, self.r, axis=1)[..., None]
        frames = frames * frame_mask
        postnet_outputs = (frames + self.postnet(frames, train=False)) \
            * frame_mask
        return {
            "decoder_outputs": frames,
            "postnet_outputs": postnet_outputs,
            "alignments": jnp.swapaxes(alignments, 0, 1),
            "stop_logits": jnp.swapaxes(stop_logits, 0, 1),
            "mel_lengths": final["n_steps_done"] * self.r,
            "decoder_state": {
                "attn_rnn": final["attn_rnn"],
                "dec_rnn": final["dec_rnn"],
                "context": final["context"],
                "last_frame": final["last_frame"],
            },
        }
