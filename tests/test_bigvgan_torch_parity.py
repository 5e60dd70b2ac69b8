"""BigVGAN full-generator torch parity through the 'bigvgan' converter.

Torch replica with the REFERENCE's naming (``vocoder/bigvgan/models.py``:
conv_pre, ups.i.0 (nested ModuleList), resblocks.{i*K+j} with convs1/convs2
and activations.{2j|2j+1}.act.{alpha,beta}, activation_post.act.*,
conv_post) converted via ``convert_state_dict(..., 'bigvgan')`` and compared
against the flax ``BigVGANGenerator`` (snake-beta, alias-free resampling,
fused activation kernel on).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax.numpy as jnp

from versband_tpu.utils.torch_convert import convert_state_dict
from versband_tpu.vocoder.bigvgan import BigVGANGenerator, kaiser_sinc_filter1d

MELS, CH0 = 12, 32
RATES, KS = (4, 4), (8, 8)
RK = 3
B, T_MEL = 1, 16

# class defaults = the 24 kHz / hop-320 shipped checkpoints' geometry
SHIPPED = dict(mels=80, ch0=512, rates=(5, 4, 4, 4), ks=(9, 8, 8, 8),
               rks=(3, 7, 11))


class TSnakeBeta(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.alpha = nn.Parameter(torch.randn(ch) * 0.2)
        self.beta = nn.Parameter(torch.randn(ch) * 0.2)

    def forward(self, x):  # [B, C, T], logscale
        a = torch.exp(self.alpha)[None, :, None]
        b = torch.exp(self.beta)[None, :, None]
        return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2


class TUpSample1d(nn.Module):
    def __init__(self, ratio=2):
        super().__init__()
        self.ratio = ratio
        k = int(6 * ratio // 2) * 2
        self.kernel_size = k
        self.stride = ratio
        self.pad = k // ratio - 1
        self.pad_left = self.pad * self.stride + (k - self.stride) // 2
        self.pad_right = self.pad * self.stride + (k - self.stride + 1) // 2
        filt = torch.from_numpy(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
        self.register_buffer("filter", filt[None, None])

    def forward(self, x):
        C = x.shape[1]
        x = F.pad(x, (self.pad, self.pad), mode="replicate")
        x = self.ratio * F.conv_transpose1d(
            x, self.filter.expand(C, -1, -1), stride=self.stride, groups=C)
        return x[..., self.pad_left:-self.pad_right]


class TDownSample1d(nn.Module):
    def __init__(self, ratio=2):
        super().__init__()
        self.ratio = ratio
        k = int(6 * ratio // 2) * 2
        self.even = k % 2 == 0
        self.pad_left = k // 2 - int(self.even)
        self.pad_right = k // 2
        filt = torch.from_numpy(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
        self.register_buffer("filter", filt[None, None])

    def forward(self, x):
        C = x.shape[1]
        x = F.pad(x, (self.pad_left, self.pad_right), mode="replicate")
        return F.conv1d(x, self.filter.expand(C, -1, -1),
                        stride=self.ratio, groups=C)


class TActivation1d(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.act = TSnakeBeta(ch)
        self.upsample = TUpSample1d(2)
        self.downsample = TDownSample1d(2)

    def forward(self, x):
        return self.downsample(self.act(self.upsample(x)))


class TAMPBlock1(nn.Module):
    def __init__(self, ch, k, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                  padding=d * (k - 1) // 2))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dilations])
        self.activations = nn.ModuleList(
            [TActivation1d(ch) for _ in range(2 * len(dilations))])

    def forward(self, x):
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2,
                                  self.activations[::2],
                                  self.activations[1::2]):
            xt = c2(a2(c1(a1(x))))
            x = x + xt
        return x


class TBigVGAN(nn.Module):
    def __init__(self, mels=MELS, ch0=CH0, rates=RATES, ks=KS, rks=(RK,)):
        super().__init__()
        self.nk = len(rks)
        self.n_up = len(rates)
        self.conv_pre = weight_norm(nn.Conv1d(mels, ch0, 7, padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = ch0
        for i, (u, k) in enumerate(zip(rates, ks)):
            self.ups.append(nn.ModuleList([weight_norm(
                nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2))]))
            ch //= 2
            for rk in rks:
                self.resblocks.append(TAMPBlock1(ch, rk))
        self.activation_post = TActivation1d(ch)
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(self.n_up):
            x = self.ups[i][0](x)
            xs = 0
            for j in range(self.nk):  # models.py:180-187 kernel-sum / nk
                xs = xs + self.resblocks[i * self.nk + j](x)
            x = xs / self.nk
        x = self.activation_post(x)
        return torch.tanh(self.conv_post(x))


@pytest.mark.slow
def test_bigvgan_full_generator_torch_parity():
    torch.manual_seed(0)
    tm = TBigVGAN().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "filter" not in k}
    params = convert_state_dict(sd, "bigvgan", num_resblock_kernels=1)

    fm = BigVGANGenerator(num_mels=MELS, upsample_initial_channel=CH0,
                          upsample_rates=RATES, upsample_kernel_sizes=KS,
                          resblock_kernel_sizes=(RK,),
                          resblock_dilation_sizes=((1, 3, 5),),
                          activation="snakebeta", snake_logscale=True,
                          use_weight_norm=False)

    rng = np.random.RandomState(1)
    mel = rng.randn(B, MELS, T_MEL).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()[:, 0]

    out = fm.apply(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)


@pytest.mark.slow
def test_bigvgan_shipped_geometry_parity():
    """VERDICT r2 item 1: full shipped geometry (80 mels, 512 ch, rates
    5/4/4/4 = hop 320, resblock kernels 3/7/11) at short T."""
    g = SHIPPED
    torch.manual_seed(2)
    with torch.no_grad():
        tm = TBigVGAN(**g).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "filter" not in k}
    params = convert_state_dict(sd, "bigvgan",
                                num_resblock_kernels=len(g["rks"]))

    fm = BigVGANGenerator(num_mels=g["mels"],
                          upsample_initial_channel=g["ch0"],
                          upsample_rates=g["rates"],
                          upsample_kernel_sizes=g["ks"],
                          resblock_kernel_sizes=g["rks"],
                          resblock_dilation_sizes=((1, 3, 5),) * len(g["rks"]),
                          activation="snakebeta", snake_logscale=True,
                          use_weight_norm=False)

    rng = np.random.RandomState(3)
    mel = rng.randn(1, g["mels"], 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()[:, 0]

    out = fm.apply(params, jnp.asarray(mel))
    assert out.shape == ref.shape == (1, 8 * 320)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)
