"""Numerical parity vs the reference PyTorch Glow-TTS.

Ports random-init reference weights through compat.torch_port.port_glow_tts
and compares: (a) the rel-pos attention layer alone with an active window
(exercising the zero-outside-window semantics), (b) the full training
forward (encoder + flow + on-device MAS), (c) deterministic inference
(noise_scale=0) through the inverse flow.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _install_ref_mas_stub():
    """The reference's Cython MAS extension isn't built in this image;
    register a numpy stand-in with identical semantics (fp32, same tie
    rule) so the reference model imports."""
    import types

    name = "TTS.tts.layers.glow_tts.monotonic_align.core"
    if name in sys.modules:
        return

    def maximum_path_c(paths, values, t_xs, t_ys, max_neg_val=-1e9):
        for b in range(values.shape[0]):
            t_x, t_y = int(t_xs[b]), int(t_ys[b])
            v = values[b]
            for y in range(t_y):
                for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                    v_cur = max_neg_val if x == y else v[x, y - 1]
                    if x == 0:
                        v_prev = 0.0 if y == 0 else max_neg_val
                    else:
                        v_prev = v[x - 1, y - 1]
                    v[x, y] = max(v_cur, v_prev) + v[x, y]
            index = t_x - 1
            for y in range(t_y - 1, -1, -1):
                paths[b, index, y] = 1
                if index != 0 and (index == y
                                   or v[index, y - 1] < v[index - 1, y - 1]):
                    index -= 1

    mod = types.ModuleType(name)
    mod.maximum_path_c = maximum_path_c
    sys.modules[name] = mod


_install_ref_mas_stub()


def _jnp(x):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(x))


class TestRelPosAttentionLayer:
    def test_windowed_attention_parity(self):
        from TTS.tts.layers.glow_tts.transformer import (
            RelativePositionMultiHeadAttention as RefAttn)
        import jax
        from tts_tpu.models.glow.transformer import (
            RelativePositionMultiHeadAttention)
        from tts_tpu.compat.torch_port import _dense_from_conv1x1

        torch.manual_seed(0)
        C, H, W, T, B = 32, 2, 4, 16, 2  # T > 2W+1 exercises zero-padding
        ref = RefAttn(C, C, H, rel_attn_window_size=W)
        ref.eval()
        x = torch.randn(B, C, T)
        with torch.no_grad():
            want = ref(x, x).numpy()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = {}
        for ours, theirs in (("q", "conv_q"), ("k", "conv_k"),
                             ("v", "conv_v"), ("out", "conv_o")):
            params[ours] = {"kernel": _dense_from_conv1x1(sd[f"{theirs}.weight"]),
                            "bias": sd[f"{theirs}.bias"].copy()}
        params["emb_rel_k"] = sd["emb_rel_k"][0]
        params["emb_rel_v"] = sd["emb_rel_v"][0]

        mod = RelativePositionMultiHeadAttention(C, H, rel_attn_window_size=W)
        got = mod.apply({"params": params}, _jnp(x.numpy().transpose(0, 2, 1)),
                        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   atol=1e-4)


@pytest.fixture(scope="module")
def ref_glow():
    from TTS.tts.models.glow_tts import GlowTts
    torch.manual_seed(0)
    model = GlowTts(num_chars=50, hidden_channels=64, filter_channels=128,
                    filter_channels_dp=64, out_channels=80, kernel_size=3,
                    num_heads=2, num_layers_enc=2, dropout_p=0.1,
                    num_flow_blocks_dec=3, kernel_size_dec=5, dilation_rate=1,
                    num_block_layers=2, dropout_p_dec=0.05, num_speakers=0,
                    c_in_channels=0, num_splits=4, num_sqz=2,
                    sigmoid_scale=False, mean_only=True,
                    hidden_channels_enc=64, hidden_channels_dec=64,
                    use_encoder_prenet=True, encoder_type="transformer")
    model.eval()
    return model


def _our_glow():
    from tts_tpu.models.glow_tts import GlowTTS
    # rel_attn_window_size=None: the reference model never forwards the
    # window to its encoder, so checkpoints carry no emb_rel_*
    return GlowTTS(num_chars=50, hidden_channels_enc=64,
                   hidden_channels_dec=64, filter_channels=128,
                   filter_channels_dp=64, num_heads=2, num_layers_enc=2,
                   num_flow_blocks_dec=3, num_block_layers=2,
                   kernel_size_dec=5, dilation_rate=1, num_sqz=2,
                   mean_only=True, rel_attn_window_size=None,
                   use_encoder_prenet=True, mas_impl="jnp")


def _port(ref_model, our_model):
    import jax
    import jax.numpy as jnp
    from tts_tpu.compat.torch_port import port_glow_tts

    rng = jax.random.PRNGKey(0)
    template = our_model.init(
        {"params": rng, "dropout": rng, "noise": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.array([8], jnp.int32),
        jnp.zeros((1, 12, 80)), jnp.array([12], jnp.int32), train=False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    from flax.core import unfreeze
    params = port_glow_tts(sd, unfreeze(template["params"]),
                           num_layers_enc=2, num_flow_blocks=3,
                           num_coupling_layers=2, mean_only=True)
    return {"params": params}


def _inputs(B=2, T_text=11, T_mel=24):
    rng = np.random.default_rng(3)
    text = rng.integers(1, 50, (B, T_text)).astype(np.int64)
    text_lengths = np.array([T_text, T_text - 3], np.int64)
    for b, L in enumerate(text_lengths):
        text[b, L:] = 0
    mel = rng.standard_normal((B, T_mel, 80)).astype(np.float32)
    mel_lengths = np.array([T_mel, T_mel - 4], np.int64)
    return text, text_lengths, mel, mel_lengths


def test_training_forward_parity(ref_glow):
    import jax

    text, text_lengths, mel, mel_lengths = _inputs()
    with torch.no_grad():
        z, logdet, y_mean, y_log_scale, attn, o_dur_log, o_attn_dur = \
            ref_glow(torch.from_numpy(text), torch.from_numpy(text_lengths),
                     torch.from_numpy(mel.transpose(0, 2, 1)),
                     torch.from_numpy(mel_lengths))

    ours = _our_glow()
    variables = _port(ref_glow, ours)
    out = ours.apply(variables, _jnp(text), _jnp(text_lengths), _jnp(mel),
                     _jnp(mel_lengths), train=False,
                     rngs={"dropout": jax.random.PRNGKey(0)})

    np.testing.assert_allclose(np.asarray(out["z"]).transpose(0, 2, 1),
                               z.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["logdet"]), logdet.numpy(),
                               atol=1e-2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               attn.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["y_mean"]).transpose(0, 2, 1),
                               y_mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["o_dur_log"])[:, :, 0], o_dur_log.numpy()[:, 0, :],
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["o_attn_dur"])[:, :, 0], o_attn_dur.numpy()[:, 0, :],
        atol=1e-4)


def test_inference_parity_deterministic(ref_glow):
    import jax

    text, text_lengths, _, _ = _inputs()
    ref_glow.noise_scale = 0.0
    with torch.no_grad():
        y_ref, _, _, _, _, _, _ = ref_glow.inference(
            torch.from_numpy(text), torch.from_numpy(text_lengths))
    y_ref = y_ref.numpy().transpose(0, 2, 1)  # (B, T, C)

    ours = _our_glow()
    variables = _port(ref_glow, ours)
    out = ours.apply(variables, _jnp(text), _jnp(text_lengths),
                     noise_scale=0.0, y_max_length=64,
                     rngs={"dropout": jax.random.PRNGKey(0),
                           "noise": jax.random.PRNGKey(1)},
                     method=type(ours).inference)
    got = np.asarray(out["model_outputs"])
    lengths = np.asarray(out["mel_lengths"])
    # compare over frames both produced (ours rounds lengths up to num_sqz)
    for b in range(text.shape[0]):
        n = min(int(lengths[b]), y_ref.shape[1])
        np.testing.assert_allclose(got[b, :n], y_ref[b, :n], atol=2e-4)


# ---------------------------------------------------------------------------
# alternative encoder types (gatedconv / time-depth-separable)
# (≙ encoder.py:87-105, gated_conv.py:6-44, time_depth_sep_conv.py:5-92)
# ---------------------------------------------------------------------------

def _ref_glow_alt(encoder_type):
    from TTS.tts.models.glow_tts import GlowTts

    torch.manual_seed(0)
    model = GlowTts(num_chars=50, hidden_channels=64, filter_channels=128,
                    filter_channels_dp=64, out_channels=80, kernel_size=3,
                    num_heads=2, num_layers_enc=2, dropout_p=0.1,
                    num_flow_blocks_dec=3, kernel_size_dec=5, dilation_rate=1,
                    num_block_layers=2, dropout_p_dec=0.05, num_speakers=0,
                    c_in_channels=0, num_splits=4, num_sqz=2,
                    sigmoid_scale=False, mean_only=True,
                    hidden_channels_enc=64, hidden_channels_dec=64,
                    use_encoder_prenet=True, encoder_type=encoder_type)
    return model


def _our_glow_alt(encoder_type):
    from tts_tpu.models.glow_tts import GlowTTS
    return GlowTTS(num_chars=50, hidden_channels_enc=64,
                   hidden_channels_dec=64, filter_channels=128,
                   filter_channels_dp=64, num_heads=2, num_layers_enc=2,
                   num_flow_blocks_dec=3, num_block_layers=2,
                   kernel_size_dec=5, dilation_rate=1, num_sqz=2,
                   mean_only=True, rel_attn_window_size=None,
                   use_encoder_prenet=True, mas_impl="jnp",
                   encoder_type=encoder_type)


@pytest.mark.parametrize("encoder_type",
                         ["gatedconv", "time-depth-separable"])
def test_alt_encoder_training_forward_parity(encoder_type):
    import jax
    import jax.numpy as jnp
    from flax.core import unfreeze

    from tts_tpu.compat.torch_port import (port_glow_tts,
                                           port_glow_tts_batch_stats)

    ref = _ref_glow_alt(encoder_type)
    text, text_lengths, mel, mel_lengths = _inputs()

    if encoder_type == "time-depth-separable":
        # populate non-trivial BatchNorm running stats, then freeze them
        ref.train()
        with torch.no_grad():
            ref(torch.from_numpy(text), torch.from_numpy(text_lengths),
                torch.from_numpy(mel.transpose(0, 2, 1)),
                torch.from_numpy(mel_lengths))
    ref.eval()
    with torch.no_grad():
        z, logdet, y_mean, y_log_scale, attn, o_dur_log, o_attn_dur = \
            ref(torch.from_numpy(text), torch.from_numpy(text_lengths),
                torch.from_numpy(mel.transpose(0, 2, 1)),
                torch.from_numpy(mel_lengths))

    ours = _our_glow_alt(encoder_type)
    rng = jax.random.PRNGKey(0)
    template = ours.init(
        {"params": rng, "dropout": rng, "noise": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.array([8], jnp.int32),
        jnp.zeros((1, 12, 80)), jnp.array([12], jnp.int32), train=False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_glow_tts(sd, unfreeze(template["params"]),
                           num_layers_enc=2, num_flow_blocks=3,
                           num_coupling_layers=2, mean_only=True,
                           encoder_type=encoder_type)
    variables = {"params": params}
    if "batch_stats" in template:
        variables["batch_stats"] = port_glow_tts_batch_stats(
            sd, unfreeze(template["batch_stats"]), num_layers=3 + 2)

    out = ours.apply(variables, _jnp(text), _jnp(text_lengths), _jnp(mel),
                     _jnp(mel_lengths), train=False,
                     rngs={"dropout": jax.random.PRNGKey(0)})

    np.testing.assert_allclose(np.asarray(out["z"]).transpose(0, 2, 1),
                               z.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               attn.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["y_mean"]).transpose(0, 2, 1),
                               y_mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["o_dur_log"])[:, :, 0], o_dur_log.numpy()[:, 0, :],
        atol=1e-4)
