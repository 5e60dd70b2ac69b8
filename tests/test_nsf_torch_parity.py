"""NSF HiFi-GAN full-generator torch parity (deterministic configuration).

Torch replica with the reference naming (``modules/hifigan_nsf.py:104-173`` +
``models/source.py`` SineGen/SourceModuleHnNSF) converted via the 'hifigan'
family. Parity is defined on the deterministic sub-space: harmonic_num=0
(fundamental phase starts at 0 on both sides), fully-voiced f0 and zero
noise — the stochastic parts (per-harmonic random initial phase, Gaussian
source noise) use different RNGs by construction. The phase math is
equivalent: sin(2*pi*(cumsum(rad % 1) % 1)) == sin(2*pi*cumsum(rad)).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from versband_tpu.utils.torch_convert import convert_state_dict
from versband_tpu.vocoder.nsf import NSFHifiGanGenerator
import pytest

CH0 = 32
RATES, KS = (4, 4), (8, 8)
RK = 3
SR = 16000
B, T_MEL = 1, 16
UP = 16


class TSourceModule(nn.Module):
    def __init__(self, sr=SR):
        super().__init__()
        self.sr = sr
        self.l_linear = nn.Linear(1, 1)  # harmonic_num=0 -> dim 1

    def forward(self, f0):  # [B, T, 1], deterministic (no noise, no rand phase)
        rad = (f0 / self.sr) % 1.0
        sines = torch.sin(2 * np.pi * torch.cumsum(rad, dim=1))
        uv = (f0 > 0).float()
        sine_wavs = 0.1 * sines * uv
        return torch.tanh(self.l_linear(sine_wavs))


class TResBlockHifi(nn.Module):
    def __init__(self, ch, k, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                  padding=d * (k - 1) // 2))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
            x = x + xt
        return x


class TNSF(nn.Module):
    def __init__(self, ch0=CH0, rates=RATES, ks=KS, rks=(RK,), sr=SR):
        super().__init__()
        self.rates = rates
        self.up = int(np.prod(rates))
        self.nk = len(rks)
        self.m_source = TSourceModule(sr)
        self.conv_pre = weight_norm(nn.Conv1d(80, ch0, 7, padding=3))
        self.ups = nn.ModuleList()
        self.noise_convs = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(zip(rates, ks)):
            c_cur = ch0 // (2 ** (i + 1))
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(c_cur * 2, c_cur, k, u,
                                   padding=(k - u) // 2)))
            if i + 1 < len(rates):
                s = int(np.prod(rates[i + 1:]))
                self.noise_convs.append(
                    nn.Conv1d(1, c_cur, kernel_size=s * 2, stride=s,
                              padding=s // 2))
            else:
                self.noise_convs.append(nn.Conv1d(1, c_cur, kernel_size=1))
            for rk in rks:
                self.resblocks.append(TResBlockHifi(c_cur, rk))
        self.conv_post = weight_norm(nn.Conv1d(c_cur, 1, 7, padding=3))

    def forward(self, mel, f0):
        f0 = F.interpolate(f0[:, None], scale_factor=self.up,
                           mode="nearest").transpose(1, 2)
        har = self.m_source(f0).transpose(1, 2)
        x = self.conv_pre(mel)
        for i in range(len(self.rates)):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            x = x + self.noise_convs[i](har)[..., : x.shape[-1]]
            xs = 0
            for j in range(self.nk):  # hifigan_nsf.py kernel-sum / nk
                xs = xs + self.resblocks[i * self.nk + j](x)
            x = xs / self.nk
        x = F.leaky_relu(x)
        return torch.tanh(self.conv_post(x))[:, 0]


def test_nsf_full_generator_torch_parity():
    torch.manual_seed(0)
    tm = TNSF().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, "hifigan", num_resblock_kernels=1)

    fm = NSFHifiGanGenerator(
        audio_sample_rate=SR, upsample_initial_channel=CH0,
        upsample_rates=RATES, upsample_kernel_sizes=KS,
        resblock_kernel_sizes=(RK,), resblock_dilation_sizes=((1, 3, 5),),
        harmonic_num=0, source_noise_std=0.0, use_weight_norm=False)

    rng = np.random.RandomState(4)
    mel = rng.randn(B, 80, T_MEL).astype(np.float32)
    f0 = rng.uniform(100, 220, (B, T_MEL)).astype(np.float32)  # all voiced

    with torch.no_grad():
        ref = tm(torch.from_numpy(mel), torch.from_numpy(f0)).numpy()

    out = np.asarray(fm.apply(params, jnp.asarray(mel), jnp.asarray(f0),
                              noise_key=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_nsf_shipped_geometry_parity():
    """VERDICT r2 item 1: shipped NSF geometry — 24 kHz, 512 ch, rates
    5/4/4/4 (hop 320), resblock kernels 3/7/11 — deterministic sub-space."""
    torch.manual_seed(5)
    with torch.no_grad():
        tm = TNSF(ch0=512, rates=(5, 4, 4, 4), ks=(9, 8, 8, 8),
                  rks=(3, 7, 11), sr=24000).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, "hifigan", num_resblock_kernels=3)

    fm = NSFHifiGanGenerator(
        audio_sample_rate=24000, upsample_initial_channel=512,
        upsample_rates=(5, 4, 4, 4), upsample_kernel_sizes=(9, 8, 8, 8),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        harmonic_num=0, source_noise_std=0.0, use_weight_norm=False)

    rng = np.random.RandomState(6)
    mel = rng.randn(1, 80, 8).astype(np.float32)
    f0 = rng.uniform(100, 220, (1, 8)).astype(np.float32)  # all voiced

    with torch.no_grad():
        ref = tm(torch.from_numpy(mel), torch.from_numpy(f0)).numpy()

    out = np.asarray(fm.apply(params, jnp.asarray(mel), jnp.asarray(f0),
                              noise_key=jax.random.PRNGKey(0)))
    assert out.shape == ref.shape == (1, 8 * 320)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)
