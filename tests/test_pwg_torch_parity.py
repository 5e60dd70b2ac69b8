"""ParallelWaveGAN full-generator torch parity through the 'pwg' converter.

A torch replica with the REFERENCE's module naming
(``vocoder/parallel_wavegan/models/parallel_wavegan.py:21-205``,
``layers/residual_block.py``, ``layers/upsample.py``: first_conv,
upsample_net.conv_in, upsample_net.upsample.up_layers.{2j+1} Conv2d,
conv_layers.{i}.{conv,conv1x1_aux,conv1x1_out,conv1x1_skip},
last_conv_layers.{1,3}) is converted via ``convert_state_dict(..., 'pwg')``
and must reproduce the flax ``ParallelWaveGANGenerator`` waveform.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax.numpy as jnp

from versband_tpu.utils.torch_convert import convert_state_dict
from versband_tpu.vocoder.pwg import ParallelWaveGANGenerator

LAYERS, STACKS = 6, 3
RES, GATE, SKIP, AUX = 16, 32, 16, 20
K = 3
SCALES = (2, 2)
ACW = 2  # aux_context_window
B, T_MEL = 2, 24
UP = 4  # prod(SCALES)
T_WAV = (T_MEL - 2 * ACW) * UP


class TResidualBlock(nn.Module):
    def __init__(self, dilation):
        super().__init__()
        pad = (K - 1) // 2 * dilation
        self.conv = weight_norm(nn.Conv1d(RES, GATE, K, padding=pad,
                                          dilation=dilation))
        self.conv1x1_aux = weight_norm(nn.Conv1d(AUX, GATE, 1, bias=False))
        self.conv1x1_out = weight_norm(nn.Conv1d(GATE // 2, RES, 1))
        self.conv1x1_skip = weight_norm(nn.Conv1d(GATE // 2, SKIP, 1))

    def forward(self, x, c):
        residual = x
        h = self.conv(x)
        xa, xb = h.split(h.size(1) // 2, dim=1)
        ch = self.conv1x1_aux(c)
        ca, cb = ch.split(ch.size(1) // 2, dim=1)
        xa, xb = xa + ca, xb + cb
        z = torch.tanh(xa) * torch.sigmoid(xb)
        s = self.conv1x1_skip(z)
        x = (self.conv1x1_out(z) + residual) * math.sqrt(0.5)
        return x, s


class TStretch2d(nn.Module):
    def __init__(self, scale):
        super().__init__()
        self.scale = scale

    def forward(self, c):
        return F.interpolate(c, scale_factor=(1, self.scale), mode="nearest")


class TUpsampleNetwork(nn.Module):
    def __init__(self):
        super().__init__()
        self.up_layers = nn.ModuleList()
        for scale in SCALES:
            self.up_layers.append(TStretch2d(scale))
            conv = nn.Conv2d(1, 1, (1, scale * 2 + 1), padding=(0, scale),
                             bias=False)
            conv.weight.data.normal_(1.0 / (scale * 2 + 1), 0.1)
            self.up_layers.append(weight_norm(conv))

    def forward(self, c):  # [B, C, T]
        c = c.unsqueeze(1)
        for f in self.up_layers:
            c = f(c)
        return c.squeeze(1)


class TConvInUpsample(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = weight_norm(
            nn.Conv1d(AUX, AUX, 2 * ACW + 1, bias=False))
        self.upsample = TUpsampleNetwork()

    def forward(self, c):
        return self.upsample(self.conv_in(c))


class TPWG(nn.Module):
    def __init__(self):
        super().__init__()
        self.first_conv = weight_norm(nn.Conv1d(1, RES, 1))
        self.upsample_net = TConvInUpsample()
        lpc = LAYERS // STACKS
        self.conv_layers = nn.ModuleList(
            [TResidualBlock(2 ** (i % lpc)) for i in range(LAYERS)])
        self.last_conv_layers = nn.ModuleList([
            nn.ReLU(), weight_norm(nn.Conv1d(SKIP, SKIP, 1)),
            nn.ReLU(), weight_norm(nn.Conv1d(SKIP, 1, 1))])

    def forward(self, x, c):
        c = self.upsample_net(c)
        x = self.first_conv(x)
        skips = 0.0
        for f in self.conv_layers:
            x, s = f(x, c)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / len(self.conv_layers))
        x = skips
        for f in self.last_conv_layers:
            x = f(x)
        return x


def test_pwg_full_generator_torch_parity():
    torch.manual_seed(0)
    tm = TPWG().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, "pwg")

    fm = ParallelWaveGANGenerator(
        layers=LAYERS, stacks=STACKS, residual_channels=RES,
        gate_channels=GATE, skip_channels=SKIP, aux_channels=AUX,
        aux_context_window=ACW, upsample_scales=SCALES,
        use_weight_norm=False)

    rng = np.random.RandomState(3)
    noise = rng.randn(B, 1, T_WAV).astype(np.float32)
    mel = rng.randn(B, AUX, T_MEL).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(noise), torch.from_numpy(mel)).numpy()

    out = fm.apply(params, jnp.asarray(noise), jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
