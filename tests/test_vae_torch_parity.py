"""1-D VAE torch parity: a torch encoder/decoder with the REFERENCE's module
naming (autoencoder1d.py structure), converted via the 'vae' rules, must
reproduce the flax AutoencoderKL's encode/decode outputs."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from versband_tpu.models.autoencoder import AutoencoderKL
from versband_tpu.utils.torch_convert import convert_state_dict


def norm(ch):
    return nn.GroupNorm(32, ch, eps=1e-6)


class TResBlock(nn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        self.norm1 = norm(cin)
        self.conv1 = nn.Conv1d(cin, cout, k, padding=k // 2)
        self.norm2 = norm(cout)
        self.conv2 = nn.Conv1d(cout, cout, k, padding=k // 2)
        self.nin_shortcut = nn.Conv1d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = norm(ch)
        self.q = nn.Conv1d(ch, ch, 1)
        self.k = nn.Conv1d(ch, ch, 1)
        self.v = nn.Conv1d(ch, ch, 1)
        self.proj_out = nn.Conv1d(ch, ch, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        w = torch.softmax(torch.einsum("bct,bcs->bts", q, k)
                          * (q.shape[1] ** -0.5), dim=-1)
        h = torch.einsum("bts,bcs->bct", w, v)
        return x + self.proj_out(h)


class TDown(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv1d(ch, ch, 3, stride=2)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1)))


class TUp(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv1d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(torch.repeat_interleave(x, 2, dim=2))


CH, MULT, ZC, EMB = 32, (1, 2), 4, 4


class TEncoder(nn.Module):
    """Reference Encoder1D layout: down.{i}.block.{j} (+attn), single 2x
    downsample at level 0, mid block+attn, norm_out/conv_out."""

    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv1d(80, CH, 5, padding=2)
        chans = [CH * m for m in MULT]
        self.down = nn.ModuleList()
        cin = CH
        for i, ch in enumerate(chans):
            lvl = nn.Module()
            lvl.block = nn.ModuleList([TResBlock(cin, ch), TResBlock(ch, ch)])
            lvl.attn = nn.ModuleList([TAttn(ch), TAttn(ch)])
            if i == 0:
                lvl.downsample = TDown(ch)
            self.down.append(lvl)
            cin = ch
        self.mid = nn.Module()
        self.mid.block_1 = TResBlock(cin, cin)
        self.mid.attn_1 = TAttn(cin)
        self.mid.block_2 = TResBlock(cin, cin)
        self.norm_out = norm(cin)
        self.conv_out = nn.Conv1d(cin, 2 * ZC, 5, padding=2)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for blk, att in zip(lvl.block, lvl.attn):
                h = att(blk(h))
            if hasattr(lvl, "downsample"):
                h = lvl.downsample(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(F.silu(self.norm_out(h)))


def test_encoder_torch_parity():
    torch.manual_seed(0)
    tenc = TEncoder().eval()
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    # quant conv completes the encode path
    qc = nn.Conv1d(2 * ZC, 2 * EMB, 1)
    sd.update({f"quant_conv.{k}": v.detach().numpy()
               for k, v in qc.state_dict().items()})

    params = convert_state_dict(sd, "vae")
    vae = AutoencoderKL(embed_dim=EMB, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=ZC,
        kernel_size=5, ch=CH, ch_mult=list(MULT), num_res_blocks=2,
        attn_layers=[0, 1], down_layers=[0], dropout=0.0))

    x = np.random.RandomState(0).randn(1, 80, 32).astype(np.float32)
    with torch.no_grad():
        ref = qc(tenc(torch.from_numpy(x))).numpy()

    post = vae.apply(params, jnp.asarray(x), method="encode")
    got = np.concatenate([np.asarray(post.mean), np.asarray(post.logvar)], 1)
    # logvar is clipped in DiagonalGaussian; compare within clip range
    ref_mean, ref_logvar = ref[:, :EMB], np.clip(ref[:, EMB:], -30, 20)
    np.testing.assert_allclose(got[:, :EMB], ref_mean, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[:, EMB:], ref_logvar, atol=2e-4, rtol=1e-3)
