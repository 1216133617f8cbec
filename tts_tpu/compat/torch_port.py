"""Port reference (Mozilla TTS, PyTorch) Tacotron2 weights into this framework.

The migration path for users of the reference: load a ``.pth.tar`` state
dict, map it onto our flax param/batch-stats trees, and synthesize with
numerically matching outputs (the BASELINE.json mel-parity metric). The
mapping handles the layout differences:

- torch Conv1d (out, in, k) -> flax NWC conv (k, in, out);
- conv biases are absorbed into BatchNorm running means (our ConvBN blocks
  are bias-free because BN cancels the bias);
- torch LSTM packed (i,f,g,o) gate blocks -> flax OptimizedLSTMCell per-gate
  Dense kernels, with b_ih + b_hh summed into the h-side gate biases;
- the attention 'v' bias is dropped (softmax energies are shift-invariant).

Works on a plain ``{name: np.ndarray}`` dict — no torch import needed here.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (out, in, k) -> flax (k, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _lstm_gates(w_ih, w_hh, b_ih, b_hh) -> Dict[str, Any]:
    """torch packed (i,f,g,o) LSTM mats -> flax OptimizedLSTMCell params."""
    H = w_ih.shape[0] // 4
    out: Dict[str, Any] = {}
    for idx, gate in enumerate("ifgo"):
        sl = slice(idx * H, (idx + 1) * H)
        out[f"i{gate}"] = {"kernel": _t(w_ih[sl])}
        out[f"h{gate}"] = {"kernel": _t(w_hh[sl]),
                           "bias": (b_ih[sl] + b_hh[sl]).copy()}
    return out


def _convbn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    """Reference ConvBNBlock -> (params, batch_stats); conv bias folded into
    the BN running mean."""
    conv_w = sd[f"{prefix}.convolution1d.weight"]
    conv_b = sd.get(f"{prefix}.convolution1d.bias")
    params = {
        "conv": {"kernel": _conv(conv_w)},
        "bn": {"scale": sd[f"{prefix}.batch_normalization.weight"].copy(),
               "bias": sd[f"{prefix}.batch_normalization.bias"].copy()},
    }
    mean = sd[f"{prefix}.batch_normalization.running_mean"].copy()
    if conv_b is not None:
        mean = mean - conv_b
    stats = {"bn": {"mean": mean,
                    "var": sd[f"{prefix}.batch_normalization.running_var"].copy()}}
    return params, stats


def port_tacotron2(state_dict: Dict[str, np.ndarray]
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference Tacotron2 state dict -> (params, batch_stats) for our model.

    Covers the single-speaker, location-attention configuration (embedding,
    encoder, decoder, postnet). Speaker/GST/DDC branches port analogously.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    params["embedding"] = {"embedding": sd["embedding.weight"].copy()}

    # ---- encoder: 3 ConvBN + BiLSTM
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    for i in range(3):
        p, s = _convbn(sd, f"encoder.convolutions.{i}")
        enc_p[f"conv_{i}"] = p
        enc_s[f"conv_{i}"] = s
    enc_p["OptimizedLSTMCell_0"] = _lstm_gates(
        sd["encoder.lstm.weight_ih_l0"], sd["encoder.lstm.weight_hh_l0"],
        sd["encoder.lstm.bias_ih_l0"], sd["encoder.lstm.bias_hh_l0"])
    enc_p["OptimizedLSTMCell_1"] = _lstm_gates(
        sd["encoder.lstm.weight_ih_l0_reverse"],
        sd["encoder.lstm.weight_hh_l0_reverse"],
        sd["encoder.lstm.bias_ih_l0_reverse"],
        sd["encoder.lstm.bias_hh_l0_reverse"])
    params["encoder"] = enc_p
    batch_stats["encoder"] = enc_s

    # ---- decoder cell
    dec: Dict[str, Any] = {}
    dec["prenet"] = {
        f"linear_{i}": {"kernel": _t(
            sd[f"decoder.prenet.linear_layers.{i}.linear_layer.weight"])}
        for i in range(2)
    }
    dec["attention_rnn"] = _lstm_gates(
        sd["decoder.attention_rnn.weight_ih"],
        sd["decoder.attention_rnn.weight_hh"],
        sd["decoder.attention_rnn.bias_ih"],
        sd["decoder.attention_rnn.bias_hh"])
    dec["decoder_rnn"] = _lstm_gates(
        sd["decoder.decoder_rnn.weight_ih"],
        sd["decoder.decoder_rnn.weight_hh"],
        sd["decoder.decoder_rnn.bias_ih"],
        sd["decoder.decoder_rnn.bias_hh"])
    attn = {
        "query_layer": {"kernel": _t(
            sd["decoder.attention.query_layer.linear_layer.weight"])},
        "inputs_layer": {"kernel": _t(
            sd["decoder.attention.inputs_layer.linear_layer.weight"])},
        # v bias dropped: shift-invariant under softmax normalization
        "v": {"kernel": _t(sd["decoder.attention.v.linear_layer.weight"])},
        "location_conv": {"kernel": _conv(
            sd["decoder.attention.location_layer.location_conv1d.weight"])},
        "location_dense": {"kernel": _t(
            sd["decoder.attention.location_layer.location_dense."
               "linear_layer.weight"])},
    }
    dec["attention"] = attn
    dec["linear_projection"] = {
        "kernel": _t(sd["decoder.linear_projection.linear_layer.weight"]),
        "bias": sd["decoder.linear_projection.linear_layer.bias"].copy(),
    }
    dec["stopnet"] = {"linear": {
        "kernel": _t(sd["decoder.stopnet.1.linear_layer.weight"]),
        "bias": sd["decoder.stopnet.1.linear_layer.bias"].copy(),
    }}
    params["decoder"] = dec

    # ---- postnet: 5 ConvBN
    post_p: Dict[str, Any] = {}
    post_s: Dict[str, Any] = {}
    for i in range(5):
        p, s = _convbn(sd, f"postnet.convolutions.{i}")
        post_p[f"conv_{i}"] = p
        post_s[f"conv_{i}"] = s
    params["postnet"] = post_p
    batch_stats["postnet"] = post_s

    return params, batch_stats


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth.tar checkpoint's model state dict as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    return {k: v.detach().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# MelGAN-family vocoder port
# ---------------------------------------------------------------------------

def _fold_wn(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """torch weight_norm (dim=0): W = v * g / ||v|| with norms over all dims
    but the first."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return v * (g / np.maximum(norm, 1e-12))


def port_melgan(state_dict: Dict[str, np.ndarray],
                upsample_factors=(8, 8, 2, 2),
                num_res_blocks: int = 3) -> Dict[str, Any]:
    """Reference MelGAN-family generator state dict -> params for our
    ``use_weight_norm=False`` generator twin (weight norm folded, transposed
    convs time-flipped to lax.conv_transpose semantics).

    Reference sequential layout (melgan_generator.py:24-70): pad, conv_in,
    then per stage [LeakyReLU, ConvTranspose, ResidualStack], then
    LeakyReLU, pad, conv_out, tanh.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix: str) -> Dict[str, np.ndarray]:
        w = _fold_wn(sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"])
        return {"kernel": _conv(w), "bias": sd[f"{prefix}.bias"].copy()}

    def conv_t(prefix: str) -> Dict[str, np.ndarray]:
        w = _fold_wn(sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"])
        # torch ConvTranspose (in, out, k): flip time, then (k, in, out)
        w = np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))
        return {"kernel": w, "bias": sd[f"{prefix}.bias"].copy()}

    layer_ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("layers.")})
    first, last = layer_ids[0], layer_ids[-1]

    params: Dict[str, Any] = {
        "proj_in": {"conv": conv(f"layers.{first}")},
        "proj_out": {"conv": conv(f"layers.{last}")},
    }
    for i in range(len(upsample_factors)):
        up_idx = first + 2 + 3 * i
        rs_idx = up_idx + 1
        params[f"upsample_{i}"] = conv_t(f"layers.{up_idx}")
        stack: Dict[str, Any] = {}
        for j in range(num_res_blocks):
            stack[f"block_{j}_conv1"] = {"conv": conv(
                f"layers.{rs_idx}.blocks.{j}.2")}
            stack[f"block_{j}_conv2"] = {"conv": conv(
                f"layers.{rs_idx}.blocks.{j}.4")}
            stack[f"block_{j}_shortcut"] = conv(
                f"layers.{rs_idx}.shortcuts.{j}")
        params[f"resstack_{i}"] = stack
    return params


# ---------------------------------------------------------------------------
# Glow-TTS port
# ---------------------------------------------------------------------------

def _dense_from_conv1x1(w: np.ndarray) -> np.ndarray:
    """torch Conv1d k=1 (out, in, 1) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w[:, :, 0].T)


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Reference glow LayerNorm (gamma/beta, shape (1,C,1)) -> flax LayerNorm."""
    return {"scale": sd[f"{prefix}.gamma"].reshape(-1).copy(),
            "bias": sd[f"{prefix}.beta"].reshape(-1).copy()}


def _conv_params(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].copy()
    return out


def _set_weight_normed_conv(node: Dict[str, Any], conv_name: str,
                            sd: Dict[str, np.ndarray], prefix: str,
                            transposer=_conv) -> None:
    """Fill a flax nn.WeightNorm(nn.Conv(name=conv_name)) pair from torch
    weight_norm params: kernel <- weight_v, scale <- weight_g.

    flax WeightNorm (feature_axes=-1) norms the kernel over all but the last
    axis — identical to torch weight_norm dim=0 after the (k,in,out) layout
    transpose — so (v, g) transfer verbatim."""
    node[conv_name] = {"kernel": transposer(sd[f"{prefix}.weight_v"])}
    if f"{prefix}.bias" in sd:
        node[conv_name]["bias"] = sd[f"{prefix}.bias"].copy()
    target_key = f"{conv_name}/kernel/scale"
    for key, child in node.items():
        if key.startswith("WeightNorm_") and isinstance(child, dict) \
                and target_key in child:
            child[target_key] = sd[f"{prefix}.weight_g"].reshape(-1).copy()
            return
    raise KeyError(f"no WeightNorm scale slot for {conv_name} in "
                   f"{[k for k in node if k.startswith('WeightNorm_')]}")


def port_glow_tts(state_dict: Dict[str, np.ndarray],
                  template: Dict[str, Any],
                  num_layers_enc: int = 6,
                  num_flow_blocks: int = 12,
                  num_coupling_layers: int = 4,
                  use_prenet: bool = True,
                  mean_only: bool = True,
                  encoder_type: str = "transformer") -> Dict[str, Any]:
    """Reference GlowTts state dict -> our params tree (all 3 encoder types).

    ``template`` is the params dict from ``GlowTTS(...).init(...)`` (unfrozen)
    — needed because flax WeightNorm scale slots are path-keyed; everything
    else is overwritten in place. Covers the reference's standard config
    (TTS/tts/utils/generic_utils.py:105-133 hard-coded glow hparams).
    For ``time-depth-separable`` the BatchNorm running stats live in the
    batch_stats collection — port them with ``port_glow_tts_batch_stats``.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def copy_tree(node):
        if isinstance(node, dict):
            return {k: copy_tree(v) for k, v in node.items()}
        return np.array(node)

    params = copy_tree(template)

    # ---------------- encoder ----------------
    enc = params["encoder"]
    enc["emb"]["embedding"] = sd["encoder.emb.weight"].copy()

    # gatedconv takes no prenet (≙ encoder.py:87-91)
    if use_prenet and encoder_type in ("transformer", "time-depth-separable"):
        pre = enc["prenet"]
        for i in range(3):
            pre[f"conv_{i}"] = _conv_params(sd, f"encoder.pre.conv_layers.{i}")
            pre[f"ln_{i}"] = _ln(sd, f"encoder.pre.norm_layers.{i}")
        pre["proj"] = _conv_params(sd, "encoder.pre.proj")

    if encoder_type == "gatedconv":
        gc = enc["encoder"]
        for i in range(3 + num_layers_enc):
            gc[f"conv_{i}"] = _conv_params(
                sd, f"encoder.encoder.conv_layers.{i}")
            gc[f"ln_{i}"] = _ln(sd, f"encoder.encoder.norm_layers.{i}")
    elif encoder_type == "time-depth-separable":
        tds = enc["encoder"]
        for i in range(3 + num_layers_enc):
            layer, ref = tds[f"layer_{i}"], f"encoder.encoder.layers.{i}"
            for conv in ("time_conv", "depth_conv", "time_conv2"):
                layer[conv] = _conv_params(sd, f"{ref}.{conv}")
            for j in (1, 2, 3):
                layer[f"norm{j}"] = {
                    "scale": sd[f"{ref}.norm{j}.weight"].copy(),
                    "bias": sd[f"{ref}.norm{j}.bias"].copy()}
    if encoder_type != "transformer":
        return _finish_glow_port(sd, params, num_flow_blocks,
                                 num_coupling_layers, mean_only)

    tr = enc["encoder"]
    for i in range(num_layers_enc):
        a = f"encoder.encoder.attn_layers.{i}"
        attn = tr[f"attn_{i}"]
        for ours, theirs in (("q", "conv_q"), ("k", "conv_k"),
                             ("v", "conv_v"), ("out", "conv_o")):
            attn[ours] = {
                "kernel": _dense_from_conv1x1(sd[f"{a}.{theirs}.weight"]),
                "bias": sd[f"{a}.{theirs}.bias"].copy()}
        # note: the reference GlowTts never forwards rel_attn_window_size to
        # its Encoder (models/glow_tts.py:72-84), so standard checkpoints have
        # no emb_rel_* — port them only when present
        if f"{a}.emb_rel_k" in sd:
            attn["emb_rel_k"] = sd[f"{a}.emb_rel_k"][0].copy()
            attn["emb_rel_v"] = sd[f"{a}.emb_rel_v"][0].copy()
        tr[f"ln1_{i}"] = _ln(sd, f"encoder.encoder.norm_layers_1.{i}")
        f = f"encoder.encoder.ffn_layers.{i}"
        tr[f"ffn_{i}"] = {"conv1": _conv_params(sd, f"{f}.conv_1"),
                          "conv2": _conv_params(sd, f"{f}.conv_2")}
        tr[f"ln2_{i}"] = _ln(sd, f"encoder.encoder.norm_layers_2.{i}")

    return _finish_glow_port(sd, params, num_flow_blocks,
                             num_coupling_layers, mean_only)


def _finish_glow_port(sd, params, num_flow_blocks, num_coupling_layers,
                      mean_only):
    """Shared tail of the GlowTts port: projections, duration predictor,
    flow decoder (encoder-type independent)."""
    enc = params["encoder"]
    enc["proj_mean"] = _conv_params(sd, "encoder.proj_m")
    if not mean_only:
        enc["proj_scale"] = _conv_params(sd, "encoder.proj_s")

    dp = enc["duration_predictor"]
    dpp = "encoder.duration_predictor"
    dp["conv1"] = _conv_params(sd, f"{dpp}.conv_1")
    dp["ln1"] = _ln(sd, f"{dpp}.norm_1")
    dp["conv2"] = _conv_params(sd, f"{dpp}.conv_2")
    dp["ln2"] = _ln(sd, f"{dpp}.norm_2")
    dp["proj"] = _conv_params(sd, f"{dpp}.proj")

    # ---------------- flow decoder ----------------
    dec = params["decoder"]
    for i in range(num_flow_blocks):
        base = 3 * i
        dec[f"actnorm_{i}"] = {
            "logs": sd[f"decoder.flows.{base}.logs"].reshape(-1).copy(),
            "bias": sd[f"decoder.flows.{base}.bias"].reshape(-1).copy()}
        dec[f"invconv_{i}"] = {
            "weight": sd[f"decoder.flows.{base + 1}.weight"].copy()}
        cp = f"decoder.flows.{base + 2}"
        coupling = dec[f"coupling_{i}"]
        _set_weight_normed_conv(coupling, "start", sd, f"{cp}.start")
        coupling["end"] = _conv_params(sd, f"{cp}.end")
        wn = coupling["wn"]
        for j in range(num_coupling_layers):
            _set_weight_normed_conv(wn, f"in_{j}", sd, f"{cp}.wn.in_layers.{j}")
            _set_weight_normed_conv(wn, f"res_skip_{j}", sd,
                                    f"{cp}.wn.res_skip_layers.{j}")
        if f"{cp}.wn.cond_layer.weight_v" in sd:
            _set_weight_normed_conv(wn, "cond_layer", sd, f"{cp}.wn.cond_layer")
    return params


def port_glow_tts_batch_stats(state_dict: Dict[str, np.ndarray],
                              template: Dict[str, Any],
                              num_layers: int) -> Dict[str, Any]:
    """BatchNorm running stats for the time-depth-separable encoder
    (≙ time_depth_sep_conv.py norm1/2/3 running_mean/var). ``template`` is
    the unfrozen batch_stats collection from init; ``num_layers`` is the
    total TDS depth (3 + num_layers_enc)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def copy_tree(node):
        if isinstance(node, dict):
            return {k: copy_tree(v) for k, v in node.items()}
        return np.array(node)

    stats = copy_tree(template)
    tds = stats["encoder"]["encoder"]
    for i in range(num_layers):
        ref = f"encoder.encoder.layers.{i}"
        for j in (1, 2, 3):
            tds[f"layer_{i}"][f"norm{j}"] = {
                "mean": sd[f"{ref}.norm{j}.running_mean"].copy(),
                "var": sd[f"{ref}.norm{j}.running_var"].copy()}
    return stats


# ---------------------------------------------------------------------------
# ParallelWaveGAN generator port
# ---------------------------------------------------------------------------

def port_pwgan(state_dict: Dict[str, np.ndarray],
               template: Dict[str, Any],
               num_res_blocks: int = 30,
               upsample_factors=(4, 4, 4, 4)) -> Dict[str, Any]:
    """Reference ParallelWaveganGenerator state dict -> our params tree
    (weight norm transfers verbatim: kernel <- weight_v, scale <- weight_g;
    ≙ parallel_wavegan_generator.py:9-158, layers/parallel_wavegan.py:5-87,
    layers/upsample.py:67-101).

    ``template`` comes from ``ParallelWaveganGenerator(...).init(...)``
    (unfrozen params dict) to locate flax WeightNorm scale slots.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def copy_tree(node):
        if isinstance(node, dict):
            return {k: copy_tree(v) for k, v in node.items()}
        return np.array(node)

    params = copy_tree(template)

    def conv2d_time(w: np.ndarray) -> np.ndarray:
        """torch Conv2d (1, 1, 1, k_t) on (B,1,C,T) -> our (k_t, 1, 1, 1)
        conv over (time, freq) spatial dims with 1 feature."""
        return np.ascontiguousarray(w[0, 0, 0][:, None, None, None])

    up = params["upsample"]
    _set_weight_normed_conv(up, "conv_in", sd, "upsample_net.conv_in")
    # up_layers: [Stretch2d, Conv2d] per factor -> convs at odd indices
    for i in range(len(upsample_factors)):
        _set_weight_normed_conv(up, f"conv_{i}", sd,
                                f"upsample_net.upsample.up_layers.{2*i+1}",
                                transposer=conv2d_time)
        # Conv2d has no bias in the reference; drop the spurious bias slot
        up[f"conv_{i}"].pop("bias", None)
    up["conv_in"].pop("bias", None)

    _set_weight_normed_conv(params, "first_conv", sd, "first_conv")
    for i in range(num_res_blocks):
        blk = params[f"block_{i}"]
        base = f"conv_layers.{i}"
        _set_weight_normed_conv(blk, "conv", sd, f"{base}.conv")
        _set_weight_normed_conv(blk, "conv_aux", sd, f"{base}.conv1x1_aux")
        blk["conv_aux"].pop("bias", None)
        _set_weight_normed_conv(blk, "conv_skip", sd, f"{base}.conv1x1_skip")
        _set_weight_normed_conv(blk, "conv_res", sd, f"{base}.conv1x1_out")
    _set_weight_normed_conv(params, "post_conv1", sd, "last_conv_layers.1")
    _set_weight_normed_conv(params, "post_conv2", sd, "last_conv_layers.3")
    return params


# ---------------------------------------------------------------------------
# Tacotron (v1) port
# ---------------------------------------------------------------------------

def _gru_gates(w_ih, w_hh, b_ih, b_hh) -> Dict[str, Any]:
    """torch packed (r,z,n) GRU mats -> flax GRUCell params.

    flax: r = sig(ir(x)+hr(h)), z likewise (h-side bias-free, so
    b_ih+b_hh sum into the i-side), n = tanh(in(x) + r*(hn(h))) with both
    biases kept separate — identical to torch's gate equations."""
    H = w_ih.shape[0] // 3
    out: Dict[str, Any] = {}
    for idx, gate in enumerate(("r", "z", "n")):
        sl = slice(idx * H, (idx + 1) * H)
        if gate == "n":
            out["in"] = {"kernel": _t(w_ih[sl]), "bias": b_ih[sl].copy()}
            out["hn"] = {"kernel": _t(w_hh[sl]), "bias": b_hh[sl].copy()}
        else:
            out[f"i{gate}"] = {"kernel": _t(w_ih[sl]),
                               "bias": (b_ih[sl] + b_hh[sl]).copy()}
            out[f"h{gate}"] = {"kernel": _t(w_hh[sl])}
    return out


def _bn_conv(sd, prefix) -> Tuple[Dict, Dict]:
    """Reference tacotron BatchNormConv1d (bias-free conv, BN after the
    activation) -> (params, batch_stats)."""
    params = {
        "conv": {"kernel": _conv(sd[f"{prefix}.conv1d.weight"])},
        "bn": {"scale": sd[f"{prefix}.bn.weight"].copy(),
               "bias": sd[f"{prefix}.bn.bias"].copy()},
    }
    stats = {"bn": {"mean": sd[f"{prefix}.bn.running_mean"].copy(),
                    "var": sd[f"{prefix}.bn.running_var"].copy()}}
    return params, stats


def _cbhg(sd, prefix, K, num_highways=4) -> Tuple[Dict, Dict]:
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for k in range(1, K + 1):
        p[f"bank_{k}"], s[f"bank_{k}"] = _bn_conv(
            sd, f"{prefix}.conv1d_banks.{k - 1}")
    for i in range(2):
        p[f"proj_{i}"], s[f"proj_{i}"] = _bn_conv(
            sd, f"{prefix}.conv1d_projections.{i}")
    if f"{prefix}.pre_highway.weight" in sd:
        p["pre_highway"] = {"kernel": _t(sd[f"{prefix}.pre_highway.weight"])}
    for i in range(num_highways):
        p[f"highway_{i}"] = {
            "H": {"kernel": _t(sd[f"{prefix}.highways.{i}.H.weight"]),
                  "bias": sd[f"{prefix}.highways.{i}.H.bias"].copy()},
            "T": {"kernel": _t(sd[f"{prefix}.highways.{i}.T.weight"]),
                  "bias": sd[f"{prefix}.highways.{i}.T.bias"].copy()},
        }
    p["GRUCell_0"] = _gru_gates(
        sd[f"{prefix}.gru.weight_ih_l0"], sd[f"{prefix}.gru.weight_hh_l0"],
        sd[f"{prefix}.gru.bias_ih_l0"], sd[f"{prefix}.gru.bias_hh_l0"])
    p["GRUCell_1"] = _gru_gates(
        sd[f"{prefix}.gru.weight_ih_l0_reverse"],
        sd[f"{prefix}.gru.weight_hh_l0_reverse"],
        sd[f"{prefix}.gru.bias_ih_l0_reverse"],
        sd[f"{prefix}.gru.bias_hh_l0_reverse"])
    return p, s


def _prenet(sd, prefix) -> Dict[str, Any]:
    return {
        f"linear_{i}": {
            "kernel": _t(sd[f"{prefix}.linear_layers.{i}.linear_layer.weight"]),
            "bias": sd[f"{prefix}.linear_layers.{i}.linear_layer.bias"].copy()}
        for i in range(2)
    }


def port_tacotron(state_dict: Dict[str, np.ndarray]
                  ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference Tacotron (v1, CBHG) state dict -> (params, batch_stats)
    (≙ models/tacotron.py:10-172, layers/tacotron.py). Single-speaker,
    location-attention configuration; the sigmoid attention norm keeps the
    energy-head ('v') bias."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {"embedding": {"embedding": sd["embedding.weight"].copy()}}
    batch_stats: Dict[str, Any] = {}

    enc_cbhg_p, enc_cbhg_s = _cbhg(sd, "encoder.cbhg.cbhg", K=16)
    params["encoder"] = {"prenet": _prenet(sd, "encoder.prenet"),
                         "cbhg": enc_cbhg_p}
    batch_stats["encoder"] = {"cbhg": enc_cbhg_s}

    dec: Dict[str, Any] = {"prenet": _prenet(sd, "decoder.prenet")}
    dec["attention_rnn"] = _gru_gates(
        sd["decoder.attention_rnn.weight_ih"],
        sd["decoder.attention_rnn.weight_hh"],
        sd["decoder.attention_rnn.bias_ih"],
        sd["decoder.attention_rnn.bias_hh"])
    dec["attention"] = {
        "query_layer": {"kernel": _t(
            sd["decoder.attention.query_layer.linear_layer.weight"])},
        "inputs_layer": {"kernel": _t(
            sd["decoder.attention.inputs_layer.linear_layer.weight"])},
        "v": {"kernel": _t(sd["decoder.attention.v.linear_layer.weight"]),
              "bias": sd["decoder.attention.v.linear_layer.bias"].copy()},
        "location_conv": {"kernel": _conv(
            sd["decoder.attention.location_layer.location_conv1d.weight"])},
        "location_dense": {"kernel": _t(
            sd["decoder.attention.location_layer.location_dense."
               "linear_layer.weight"])},
    }
    dec["project_to_decoder_in"] = {
        "kernel": _t(sd["decoder.project_to_decoder_in.weight"]),
        "bias": sd["decoder.project_to_decoder_in.bias"].copy()}
    for i in range(2):
        dec[f"decoder_rnn_{i}"] = _gru_gates(
            sd[f"decoder.decoder_rnns.{i}.weight_ih"],
            sd[f"decoder.decoder_rnns.{i}.weight_hh"],
            sd[f"decoder.decoder_rnns.{i}.bias_ih"],
            sd[f"decoder.decoder_rnns.{i}.bias_hh"])
    dec["proj_to_mel"] = {"kernel": _t(sd["decoder.proj_to_mel.weight"]),
                          "bias": sd["decoder.proj_to_mel.bias"].copy()}
    dec["stopnet"] = {"linear": {
        "kernel": _t(sd["decoder.stopnet.linear.weight"]),
        "bias": sd["decoder.stopnet.linear.bias"].copy()}}
    params["decoder"] = dec

    post_p, post_s = _cbhg(sd, "postnet.cbhg", K=8)
    params["postnet"] = {"cbhg": post_p}
    batch_stats["postnet"] = {"cbhg": post_s}
    params["last_linear"] = {"kernel": _t(sd["last_linear.weight"]),
                             "bias": sd["last_linear.bias"].copy()}
    return params, batch_stats


# ---------------------------------------------------------------------------
# Speaker encoder port
# ---------------------------------------------------------------------------

def port_speaker_encoder(state_dict: Dict[str, np.ndarray],
                         num_layers: int = 3) -> Dict[str, Any]:
    """Reference SpeakerEncoder (LSTMWithProjection stack,
    speaker_encoder/model.py:5-62) -> our params tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    for i in range(num_layers):
        base = f"layers.{i}"
        params[f"layer_{i}"] = {
            "OptimizedLSTMCell_0": _lstm_gates(
                sd[f"{base}.lstm.weight_ih_l0"],
                sd[f"{base}.lstm.weight_hh_l0"],
                sd[f"{base}.lstm.bias_ih_l0"],
                sd[f"{base}.lstm.bias_hh_l0"]),
            "proj": {"kernel": _t(sd[f"{base}.linear.weight"])},
        }
    return params


# ---------------------------------------------------------------------------
# WaveRNN port (fatchord/erogol external repo, the reference's WaveRNN hook)
# ---------------------------------------------------------------------------

def port_wavernn(state_dict: Dict[str, np.ndarray],
                 res_blocks: int = 10,
                 upsample_factors=(4, 8, 8)) -> Tuple[Dict, Dict]:
    """External fatchord-style WaveRNN state dict -> (params, batch_stats).

    The reference serves WaveRNN by importing ``WaveRNN.models.wavernn.Model``
    from an external checkout (/root/reference/TTS/server/synthesizer.py:93-125);
    this maps that repo's ``state_dict()`` names (``upsample.resnet.*``,
    ``upsample.up_layers.{2i+1}.weight``, ``I``/``rnn1``/``rnn2``/``fc1-3``)
    onto models/vocoder/wavernn.py. Covers bits mode (use_upsample_net=True,
    use_aux_net=True — the shipped-model configuration); element-wise parity
    vs a torch twin in tests/test_torch_parity_wavernn.py.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def bn(prefix: str) -> Tuple[Dict, Dict]:
        return ({"scale": sd[f"{prefix}.weight"].copy(),
                 "bias": sd[f"{prefix}.bias"].copy()},
                {"mean": sd[f"{prefix}.running_mean"].copy(),
                 "var": sd[f"{prefix}.running_var"].copy()})

    rp: Dict[str, Any] = {}
    rs: Dict[str, Any] = {}
    rp["conv_in"] = {"kernel": _conv(sd["upsample.resnet.conv_in.weight"])}
    rp["bn_in"], rs["bn_in"] = bn("upsample.resnet.batch_norm")
    for i in range(res_blocks):
        base = f"upsample.resnet.layers.{i}"
        rp[f"res_{i}_conv1"] = {"kernel": _conv(sd[f"{base}.conv1.weight"])}
        rp[f"res_{i}_bn1"], rs[f"res_{i}_bn1"] = bn(f"{base}.batch_norm1")
        rp[f"res_{i}_conv2"] = {"kernel": _conv(sd[f"{base}.conv2.weight"])}
        rp[f"res_{i}_bn2"], rs[f"res_{i}_bn2"] = bn(f"{base}.batch_norm2")
    rp["conv_out"] = {
        "kernel": _conv(sd["upsample.resnet.conv_out.weight"]),
        "bias": sd["upsample.resnet.conv_out.bias"].copy()}
    # a checkpoint trained with MORE res blocks than requested would
    # otherwise be silently truncated into a wrong-but-loading tree
    extra = [k for k in sd
             if k.startswith(f"upsample.resnet.layers.{res_blocks}.")]
    if extra:
        raise ValueError(
            f"state dict has res blocks beyond res_blocks={res_blocks} "
            f"(e.g. {extra[0]}); pass the checkpoint's true res_blocks")

    # mirror the res-blocks guard for the upsample tower: a checkpoint with
    # MORE stages than upsample_factors would be silently truncated (and when
    # the factor products coincide, e.g. (2,4,4,8) vs (4,8,8) both = 256, the
    # Synthesizer hop check can't catch it either)
    extra_up = f"upsample.up_layers.{2 * len(upsample_factors) + 1}.weight"
    if extra_up in sd:
        raise ValueError(
            f"state dict has upsample stages beyond upsample_factors="
            f"{tuple(upsample_factors)} (found {extra_up}); pass the "
            "checkpoint's true upsample_factors")

    up: Dict[str, Any] = {"resnet": rp}
    for i, f in enumerate(upsample_factors):
        # up_layers interleaves Stretch2d (no params) with Conv2d(1,1,(1,k)):
        # the conv sits at index 2i+1; its (1,1,1,k) weight is the single
        # k-tap smoothing filter shared across mel bins -> our (k,1,1) param
        w = sd[f"upsample.up_layers.{2 * i + 1}.weight"]
        up[f"smooth_{i}_kernel"] = np.ascontiguousarray(
            w.reshape(-1)[:, None, None])

    cell: Dict[str, Any] = {
        "I": {"kernel": _t(sd["I.weight"]), "bias": sd["I.bias"].copy()},
        "rnn1": _gru_gates(sd["rnn1.weight_ih_l0"], sd["rnn1.weight_hh_l0"],
                           sd["rnn1.bias_ih_l0"], sd["rnn1.bias_hh_l0"]),
        "rnn2": _gru_gates(sd["rnn2.weight_ih_l0"], sd["rnn2.weight_hh_l0"],
                           sd["rnn2.bias_ih_l0"], sd["rnn2.bias_hh_l0"]),
        "fc1": {"kernel": _t(sd["fc1.weight"]), "bias": sd["fc1.bias"].copy()},
        "fc2": {"kernel": _t(sd["fc2.weight"]), "bias": sd["fc2.bias"].copy()},
        "fc3": {"kernel": _t(sd["fc3.weight"]), "bias": sd["fc3.bias"].copy()},
    }
    params = {"upsample": up, "cell": cell}
    batch_stats = {"upsample": {"resnet": rs}}
    return params, batch_stats
