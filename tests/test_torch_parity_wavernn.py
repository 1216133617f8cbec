"""Numerical parity for the WaveRNN checkpoint port.

The reference serves WaveRNN from an EXTERNAL torch repo
(/root/reference/TTS/server/synthesizer.py:93-125, fatchord/erogol
architecture); that repo is not in this image, so this test carries a
minimal torch twin reproducing its module graph AND its exact
``state_dict()`` naming (``upsample.resnet.*``,
``upsample.up_layers.{2i+1}``, ``I``/``rnn1``/``rnn2``/``fc1-3``), ports
random-init weights through ``compat.torch_port.port_wavernn``, and
requires element-wise agreement of the teacher-forced forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

BITS = 8
RNN_DIMS = 32
FC_DIMS = 24
FEAT_DIMS = 20
COMPUTE_DIMS = 16
RES_OUT_DIMS = 16
RES_BLOCKS = 2
PAD = 2
FACTORS = (2, 4)


class _TorchResBlock(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.conv1 = nn.Conv1d(dims, dims, 1, bias=False)
        self.conv2 = nn.Conv1d(dims, dims, 1, bias=False)
        self.batch_norm1 = nn.BatchNorm1d(dims)
        self.batch_norm2 = nn.BatchNorm1d(dims)

    def forward(self, x):
        residual = x
        x = F.relu(self.batch_norm1(self.conv1(x)))
        x = self.batch_norm2(self.conv2(x))
        return x + residual


class _TorchMelResNet(nn.Module):
    def __init__(self, res_blocks, in_dims, compute_dims, res_out_dims, pad):
        super().__init__()
        k_size = pad * 2 + 1
        self.conv_in = nn.Conv1d(in_dims, compute_dims, k_size, bias=False)
        self.batch_norm = nn.BatchNorm1d(compute_dims)
        self.layers = nn.ModuleList(
            [_TorchResBlock(compute_dims) for _ in range(res_blocks)])
        self.conv_out = nn.Conv1d(compute_dims, res_out_dims, 1)

    def forward(self, x):
        x = F.relu(self.batch_norm(self.conv_in(x)))
        for f in self.layers:
            x = f(x)
        return self.conv_out(x)


class _TorchStretch2d(nn.Module):
    def __init__(self, x_scale, y_scale):
        super().__init__()
        self.x_scale = x_scale
        self.y_scale = y_scale

    def forward(self, x):
        b, c, h, w = x.size()
        x = x.unsqueeze(-1).unsqueeze(3)
        x = x.repeat(1, 1, 1, self.y_scale, 1, self.x_scale)
        return x.view(b, c, h * self.y_scale, w * self.x_scale)


class _TorchUpsampleNetwork(nn.Module):
    def __init__(self, feat_dims, upsample_scales, compute_dims,
                 res_blocks, res_out_dims, pad):
        super().__init__()
        total_scale = int(np.prod(upsample_scales))
        self.indent = pad * total_scale
        self.resnet = _TorchMelResNet(res_blocks, feat_dims, compute_dims,
                                      res_out_dims, pad)
        self.resnet_stretch = _TorchStretch2d(total_scale, 1)
        self.up_layers = nn.ModuleList()
        for scale in upsample_scales:
            k_size = (1, scale * 2 + 1)
            padding = (0, scale)
            stretch = _TorchStretch2d(scale, 1)
            conv = nn.Conv2d(1, 1, kernel_size=k_size, padding=padding,
                             bias=False)
            conv.weight.data.fill_(1.0 / k_size[1])
            self.up_layers.append(stretch)
            self.up_layers.append(conv)

    def forward(self, m):
        aux = self.resnet(m).unsqueeze(1)
        aux = self.resnet_stretch(aux)
        aux = aux.squeeze(1)
        m = m.unsqueeze(1)
        for f in self.up_layers:
            m = f(m)
        m = m.squeeze(1)[:, :, self.indent:-self.indent]
        return m.transpose(1, 2), aux.transpose(1, 2)


class _TorchWaveRNN(nn.Module):
    """Bits-mode fatchord Model (use_upsample_net=True, use_aux_net=True)."""

    def __init__(self):
        super().__init__()
        self.aux_dims = RES_OUT_DIMS // 4
        self.upsample = _TorchUpsampleNetwork(
            FEAT_DIMS, FACTORS, COMPUTE_DIMS, RES_BLOCKS, RES_OUT_DIMS, PAD)
        self.I = nn.Linear(FEAT_DIMS + self.aux_dims + 1, RNN_DIMS)
        self.rnn1 = nn.GRU(RNN_DIMS, RNN_DIMS, batch_first=True)
        self.rnn2 = nn.GRU(RNN_DIMS + self.aux_dims, RNN_DIMS,
                           batch_first=True)
        self.fc1 = nn.Linear(RNN_DIMS + self.aux_dims, FC_DIMS)
        self.fc2 = nn.Linear(FC_DIMS + self.aux_dims, FC_DIMS)
        self.fc3 = nn.Linear(FC_DIMS, 2 ** BITS)

    def forward(self, x, mels):
        bsize = x.size(0)
        h1 = torch.zeros(1, bsize, RNN_DIMS)
        h2 = torch.zeros(1, bsize, RNN_DIMS)
        mels, aux = self.upsample(mels)
        idx = [self.aux_dims * i for i in range(5)]
        a1 = aux[:, :, idx[0]:idx[1]]
        a2 = aux[:, :, idx[1]:idx[2]]
        a3 = aux[:, :, idx[2]:idx[3]]
        a4 = aux[:, :, idx[3]:idx[4]]
        x = torch.cat([x.unsqueeze(-1), mels, a1], dim=2)
        x = self.I(x)
        res = x
        x, _ = self.rnn1(x, h1)
        x = x + res
        res = x
        x = torch.cat([x, a2], dim=2)
        x, _ = self.rnn2(x, h2)
        x = x + res
        x = torch.cat([x, a3], dim=2)
        x = F.relu(self.fc1(x))
        x = torch.cat([x, a4], dim=2)
        x = F.relu(self.fc2(x))
        return self.fc3(x)


def test_wavernn_port_parity():
    import jax
    import jax.numpy as jnp

    from tts_tpu.compat.torch_port import port_wavernn
    from tts_tpu.models.vocoder.wavernn import WaveRNN

    torch.manual_seed(0)
    ref = _TorchWaveRNN()
    # randomize BN stats + the (init-constant) smoothing filters so the
    # port is exercised on non-trivial values
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0, 0.2)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = port_wavernn(sd, res_blocks=RES_BLOCKS,
                                       upsample_factors=FACTORS)

    rng = np.random.RandomState(1)
    hop = int(np.prod(FACTORS))
    t_frames = 2 * PAD + 6
    t_samples = 6 * hop
    mel = rng.randn(2, t_frames, FEAT_DIMS).astype(np.float32)
    x = rng.uniform(-1, 1, (2, t_samples)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x),
                         torch.from_numpy(mel).transpose(1, 2)).numpy()

    model = WaveRNN(bits=BITS, rnn_dims=RNN_DIMS, fc_dims=FC_DIMS,
                    feat_dims=FEAT_DIMS, compute_dims=COMPUTE_DIMS,
                    res_out_dims=RES_OUT_DIMS, res_blocks=RES_BLOCKS,
                    pad=PAD, upsample_factors=FACTORS)
    ours = model.apply({"params": params, "batch_stats": batch_stats},
                       jnp.asarray(x), jnp.asarray(mel), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=2e-4, rtol=1e-3)


def test_wavernn_port_shapes_match_init():
    """The ported tree must be a drop-in for a model.init tree (same
    structure + shapes), so checkpoints load through train.checkpoint."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.compat.torch_port import port_wavernn
    from tts_tpu.models.vocoder.wavernn import WaveRNN

    torch.manual_seed(0)
    sd = {k: v.detach().numpy()
          for k, v in _TorchWaveRNN().state_dict().items()}
    params, batch_stats = port_wavernn(sd, res_blocks=RES_BLOCKS,
                                       upsample_factors=FACTORS)

    model = WaveRNN(bits=BITS, rnn_dims=RNN_DIMS, fc_dims=FC_DIMS,
                    feat_dims=FEAT_DIMS, compute_dims=COMPUTE_DIMS,
                    res_out_dims=RES_OUT_DIMS, res_blocks=RES_BLOCKS,
                    pad=PAD, upsample_factors=FACTORS)
    hop = int(np.prod(FACTORS))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2 * hop)), jnp.zeros((1, 2 * PAD + 2, FEAT_DIMS)))

    ref_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    port_shapes = jax.tree_util.tree_map(np.shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) \
        == jax.tree_util.tree_structure(port_shapes)
    assert jax.tree_util.tree_leaves(ref_shapes) \
        == jax.tree_util.tree_leaves(port_shapes)


def test_port_rejects_truncating_res_blocks():
    """A checkpoint with MORE res blocks than requested must raise, not
    silently truncate into a wrong-but-loading tree."""
    from tts_tpu.compat.torch_port import port_wavernn

    torch.manual_seed(0)
    sd = {k: v.detach().numpy()
          for k, v in _TorchWaveRNN().state_dict().items()}
    with pytest.raises(ValueError, match="res_blocks"):
        port_wavernn(sd, res_blocks=RES_BLOCKS - 1,
                     upsample_factors=FACTORS)
