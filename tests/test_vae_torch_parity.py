"""1-D VAE torch parity: torch encoder/decoder replicas with the REFERENCE's
module naming (autoencoder1d.py structure), converted via the 'vae' rules,
must reproduce the flax AutoencoderKL's encode/decode outputs.

Geometries: tiny (converter-rule check) and SHIPPED — ch 384, mult (1,2,4),
z/embed 20, kernel 5, attn_layers [3] (out of range => no level attention,
faithfully matching configs/ae_accomp.yaml), down_layers [0]
(VERDICT r2 item 1: parity at the shipped width)."""

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


TINY = dict(CH=32, MULT=(1, 2), ZC=4, EMB=4, ATTN=(0, 1), DOWN=(0,), NRB=2,
            K=5)
# configs/ae_accomp.yaml ddconfig (attn_layers [3] is outside the 3 levels —
# the reference builds NO level attention for it; mid attn remains)
SHIPPED = dict(CH=384, MULT=(1, 2, 4), ZC=20, EMB=20, ATTN=(3,), DOWN=(0,),
               NRB=2, K=5)


class TEncoder(nn.Module):
    """Reference Encoder1D layout (``autoencoder1d.py:315-409``):
    down.{i}.block.{j} (+attn), 2x downsample at down_layers levels, mid
    block+attn (kernel_size respected in encoder), norm_out/conv_out."""

    def __init__(self, g):
        super().__init__()
        CH, MULT, K = g["CH"], g["MULT"], g["K"]
        self.conv_in = nn.Conv1d(80, CH, K, padding=K // 2)
        self.down = nn.ModuleList()
        cin = CH
        for i, m in enumerate(MULT):
            ch = CH * m
            lvl = nn.Module()
            lvl.block = nn.ModuleList(
                [TResBlock(cin if j == 0 else ch, ch, K)
                 for j in range(g["NRB"])])
            if i in g["ATTN"]:
                lvl.attn = nn.ModuleList([TAttn(ch) for _ in range(g["NRB"])])
            else:
                lvl.attn = nn.ModuleList()
            if i in g["DOWN"]:
                lvl.downsample = TDown(ch)
            self.down.append(lvl)
            cin = ch
        self.mid = nn.Module()
        self.mid.block_1 = TResBlock(cin, cin, K)
        self.mid.attn_1 = TAttn(cin)
        self.mid.block_2 = TResBlock(cin, cin, K)
        self.norm_out = norm(cin)
        self.conv_out = nn.Conv1d(cin, 2 * g["ZC"], K, padding=K // 2)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for j, blk in enumerate(lvl.block):
                h = blk(h)
                if len(lvl.attn) > 0:
                    h = lvl.attn[j](h)
            if hasattr(lvl, "downsample"):
                h = lvl.downsample(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(F.silu(self.norm_out(h)))


class TDecoder(nn.Module):
    """Reference Decoder1D layout (``autoencoder1d.py:411-510``): conv_in at
    kernel_size, mid + up res blocks at DEFAULT k=3 (the reference omits
    kernel_size there — the k5/k3 asymmetry), upsample at down_layers+1
    levels, conv_out at kernel_size."""

    def __init__(self, g):
        super().__init__()
        CH, MULT, K = g["CH"], g["MULT"], g["K"]
        nl = len(MULT)
        up_layers = [i + 1 for i in g["DOWN"]]
        block_in = CH * MULT[-1]
        self.conv_in = nn.Conv1d(g["ZC"], block_in, K, padding=K // 2)
        self.mid = nn.Module()
        self.mid.block_1 = TResBlock(block_in, block_in, 3)
        self.mid.attn_1 = TAttn(block_in)
        self.mid.block_2 = TResBlock(block_in, block_in, 3)
        ups = []
        cin = block_in
        for i_level in reversed(range(nl)):
            ch = CH * MULT[i_level]
            lvl = nn.Module()
            lvl.block = nn.ModuleList(
                [TResBlock(cin if j == 0 else ch, ch, 3)
                 for j in range(g["NRB"] + 1)])
            if i_level in g["ATTN"]:
                lvl.attn = nn.ModuleList(
                    [TAttn(ch) for _ in range(g["NRB"] + 1)])
            else:
                lvl.attn = nn.ModuleList()
            cin = ch
            if i_level in up_layers:
                lvl.upsample = TUp(ch)
            ups.insert(0, lvl)  # prepend, as the reference does
        self.up = nn.ModuleList(ups)
        self.norm_out = norm(cin)
        self.conv_out = nn.Conv1d(cin, 80, K, padding=K // 2)

    def forward(self, z):
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(
            self.conv_in(z))))
        nl = len(self.up)
        for i_level in reversed(range(nl)):
            lvl = self.up[i_level]
            for j, blk in enumerate(lvl.block):
                h = blk(h)
                if len(lvl.attn) > 0:
                    h = lvl.attn[j](h)
            if hasattr(lvl, "upsample"):
                h = lvl.upsample(h)
        return self.conv_out(F.silu(self.norm_out(h)))


def _flax_vae(g):
    return AutoencoderKL(embed_dim=g["EMB"], ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=g["ZC"],
        kernel_size=g["K"], ch=g["CH"], ch_mult=list(g["MULT"]),
        num_res_blocks=g["NRB"], attn_layers=list(g["ATTN"]),
        down_layers=list(g["DOWN"]), dropout=0.0))


def _run_encoder_parity(g, atol):
    torch.manual_seed(0)
    with torch.no_grad():
        tenc = TEncoder(g).eval()
        qc = nn.Conv1d(2 * g["ZC"], 2 * g["EMB"], 1)
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    sd.update({f"quant_conv.{k}": v.detach().numpy()
               for k, v in qc.state_dict().items()})

    params = convert_state_dict(sd, "vae")
    vae = _flax_vae(g)

    x = np.random.RandomState(0).randn(1, 80, 32).astype(np.float32)
    with torch.no_grad():
        ref = qc(tenc(torch.from_numpy(x))).numpy()

    post = vae.apply(params, jnp.asarray(x), method="encode")
    got = np.concatenate([np.asarray(post.mean), np.asarray(post.logvar)], 1)
    EMB = g["EMB"]
    # logvar is clipped in DiagonalGaussian; compare within clip range
    ref_mean, ref_logvar = ref[:, :EMB], np.clip(ref[:, EMB:], -30, 20)
    np.testing.assert_allclose(got[:, :EMB], ref_mean, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(got[:, EMB:], ref_logvar, atol=atol, rtol=1e-3)


def _run_decoder_parity(g, atol):
    torch.manual_seed(1)
    with torch.no_grad():
        tdec = TDecoder(g).eval()
        pqc = nn.Conv1d(g["EMB"], g["ZC"], 1)
    sd = {f"decoder.{k}": v.detach().numpy()
          for k, v in tdec.state_dict().items()}
    sd.update({f"post_quant_conv.{k}": v.detach().numpy()
               for k, v in pqc.state_dict().items()})

    params = convert_state_dict(sd, "vae")
    vae = _flax_vae(g)

    z = np.random.RandomState(1).randn(1, g["EMB"], 16).astype(np.float32)
    with torch.no_grad():
        ref = tdec(pqc(torch.from_numpy(z))).numpy()

    got = vae.apply(params, jnp.asarray(z), method="decode")
    np.testing.assert_allclose(np.asarray(got), ref, atol=atol, rtol=1e-3)


def test_encoder_torch_parity():
    _run_encoder_parity(TINY, atol=2e-4)


def test_decoder_torch_parity():
    _run_decoder_parity(TINY, atol=2e-4)


@pytest.mark.slow
def test_encoder_shipped_geometry_parity():
    _run_encoder_parity(SHIPPED, atol=1e-3)


def test_decoder_shipped_geometry_parity():
    _run_decoder_parity(SHIPPED, atol=1e-3)
