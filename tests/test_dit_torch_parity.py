"""Full Band-MOE DiT torch parity — tiny AND shipped geometry.

A torch replica built with the REFERENCE's module naming
(``vocal2music_moe.py``: layers.N.attention.wq, feed_forward.*_experts.i.wN,
high_level_gating_network, cross_attention (nn.MultiheadAttention),
adaLN_modulation.1, midi/beats stems, final_layer) is converted through the
'dit' rules and must reproduce the flax ``BandMoeDiT`` forward.

Parity is defined on DETERMINISTIC evaluation (SURVEY.md §7.3 item 1): both
sides run Gumbel-softmax WITHOUT noise (softmax for the high-level gate,
argmax one-hot for the per-token expert choice). The reference adds Gumbel
noise even at eval, which makes bit-parity impossible by construction — the
deterministic limit is the comparable quantity.

Geometries:
  * tiny  — D=16/h2/d1/E2 (fast converter-rule check);
  * shipped — D=768/h8/d4/E4/ori 1024/in_ch 20/multiple_of 256, exactly
    ``configs/vocal2music.yaml:33-43`` at short T (VERDICT r2 item 1: parity
    must hold at the shipped width, not just toy width).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from versband_tpu.models.dit import BandMoeDiT
from versband_tpu.utils.torch_convert import convert_state_dict

MIDI_V, BEATS_V = 130, 3

TINY = dict(D=16, HEADS=2, DEPTH=1, E=2, ORI=12, MULT=8, IN_CH=4, MAX_LEN=64)
# configs/vocal2music.yaml unet_config.params, reference defaults for MULT
SHIPPED = dict(D=768, HEADS=8, DEPTH=4, E=4, ORI=1024, MULT=256, IN_CH=20,
               MAX_LEN=64)


def swiglu_hidden(dim, multiple_of):
    h = int(2 * dim / 3)
    return multiple_of * ((h + multiple_of - 1) // multiple_of)


class TRMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xf = x.float()
        n = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + 1e-5)
        return n.type_as(x) * self.weight


class TFeedForward(nn.Module):
    def __init__(self, dim, hidden, mult):
        super().__init__()
        h = swiglu_hidden(hidden, mult)
        self.w1 = nn.Linear(dim, h, bias=False)
        self.w2 = nn.Linear(h, dim, bias=False)
        self.w3 = nn.Linear(dim, h, bias=False)

    def forward(self, x):
        return self.w2(F.silu(self.w1(x)) * self.w3(x))


class TAttention(nn.Module):
    """Reference Attention: RoPE complex multiply + zero-init tanh-gated
    cross (``flag_large_dit_moe.py:163-406``), SDPA path."""

    def __init__(self, dim, heads, y_dim):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.wq = nn.Linear(dim, dim, bias=False)
        self.wk = nn.Linear(dim, dim, bias=False)
        self.wv = nn.Linear(dim, dim, bias=False)
        self.wo = nn.Linear(dim, dim, bias=False)
        self.wk_y = nn.Linear(y_dim, dim, bias=False)
        self.wv_y = nn.Linear(y_dim, dim, bias=False)
        self.gate = nn.Parameter(torch.zeros(heads))

    @staticmethod
    def rope(x, freqs_cis):
        xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
        out = torch.view_as_real(xc * freqs_cis[: x.shape[1]][None, :, None])
        return out.flatten(3).type_as(x)

    def forward(self, x, y, freqs_cis):
        B, T, _ = x.shape
        q = self.wq(x).view(B, T, self.heads, self.hd)
        k = self.wk(x).view(B, T, self.heads, self.hd)
        v = self.wv(x).view(B, T, self.heads, self.hd)
        q, k = self.rope(q, freqs_cis), self.rope(k, freqs_cis)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        ky = self.wk_y(y).view(B, -1, self.heads, self.hd)
        vy = self.wv_y(y).view(B, -1, self.heads, self.hd)
        out_y = F.scaled_dot_product_attention(
            q.transpose(1, 2), ky.transpose(1, 2), vy.transpose(1, 2))
        out = out + torch.tanh(self.gate).view(1, -1, 1, 1) * out_y
        return self.wo(out.transpose(1, 2).reshape(B, T, -1))


class TMoE(nn.Module):
    """Reference Band-MOE in its deterministic-eval limit
    (``vocal2music_moe.py:39-186``; cross_attention heads hardcoded 8 at
    ``:79``)."""

    def __init__(self, dim, e, mult):
        super().__init__()
        self.e = e
        self.high_level_gating_network = nn.Linear(dim, 2)
        self.caption_gating_network = nn.Linear(dim, e)
        self.acoustic_gating_network = nn.Linear(dim, e)
        self.caption_experts = nn.ModuleDict(
            {str(i): TFeedForward(dim, dim, mult) for i in range(e)})
        self.acoustic_experts = nn.ModuleDict(
            {str(i): TFeedForward(dim, dim, mult) for i in range(e)})
        self.freq_experts = nn.ModuleDict(
            {str(i): TFeedForward(dim, dim, mult) for i in range(e)})
        self.cross_attention = nn.MultiheadAttention(dim, 8, batch_first=True)

    def forward(self, x, t_emb, caption, acoustic):
        B, T, dim = x.shape
        e = self.e
        cap_feat, _ = self.cross_attention(x, caption, caption)
        hl = torch.softmax(self.high_level_gating_network(t_emb), -1)
        cap_mask = hl[:, 0].view(B, 1, 1)
        ac_mask = hl[:, 1].view(B, 1, 1)
        # deterministic hard routing: one-hot argmax (tau irrelevant)
        cap_p = F.one_hot(self.caption_gating_network(cap_feat).argmax(-1),
                          e).float()
        ac_p = F.one_hot(self.acoustic_gating_network(acoustic).argmax(-1),
                         e).float()
        y = torch.zeros_like(x)
        for i in range(e):
            y = y + self.caption_experts[str(i)](x) * \
                cap_p[..., i:i + 1] * cap_mask
            y = y + self.acoustic_experts[str(i)](x) * \
                ac_p[..., i:i + 1] * ac_mask
        band = dim // e
        z = torch.zeros_like(y)
        for i in range(e):
            region = torch.zeros_like(y)
            region[:, :, band * i: band * (i + 1)] = 1.0
            z[:, :, band * i: band * (i + 1)] = self.freq_experts[str(i)](
                y * region)[:, :, band * i: band * (i + 1)]
        return z


class TBlock(nn.Module):
    def __init__(self, dim, heads, e, mult):
        super().__init__()
        self.attention = TAttention(dim, heads, dim)
        self.feed_forward = TMoE(dim, e, mult)
        self.attention_norm = TRMSNorm(dim)
        self.ffn_norm = TRMSNorm(dim)
        self.attention_y_norm = TRMSNorm(dim)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(),
                                              nn.Linear(dim, 6 * dim))

    def forward(self, x, y, freqs_cis, adaln, t_emb, acoustic):
        mods = self.adaLN_modulation(adaln).chunk(6, dim=1)
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = mods

        def modulate(h, shift, scale):
            return h * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)

        h = x + g_msa.unsqueeze(1) * self.attention(
            modulate(self.attention_norm(x), s_msa, sc_msa),
            self.attention_y_norm(y), freqs_cis)
        out = self.feed_forward(
            modulate(self.ffn_norm(h), s_mlp, sc_mlp), t_emb, y, acoustic)
        return h + g_mlp.unsqueeze(1) * out


class TTimestepEmbedder(nn.Module):
    def __init__(self, dim, freq=256):
        super().__init__()
        self.freq = freq
        self.mlp = nn.Sequential(nn.Linear(freq, dim), nn.SiLU(),
                                 nn.Linear(dim, dim))

    def forward(self, t):
        half = self.freq // 2
        freqs = torch.exp(-math.log(10000) *
                          torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


class TConditionEmbedder(nn.Module):
    def __init__(self, dim, ctx):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(ctx, dim), nn.GELU(),
                                 nn.Linear(dim, dim))
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(self.mlp(x))


class TDiT(nn.Module):
    """TxtFlagLargeImprovedDiTV2 replica with reference names, any geometry."""

    def __init__(self, g):
        super().__init__()
        D, HEADS, DEPTH = g["D"], g["HEADS"], g["DEPTH"]
        E, ORI, MULT = g["E"], g["ORI"], g["MULT"]
        IN_CH, MAX_LEN = g["IN_CH"], g["MAX_LEN"]
        self.t_embedder = TTimestepEmbedder(D)
        self.c_embedder = TConditionEmbedder(D, ORI)
        self.cap_embedder = nn.Sequential(nn.LayerNorm(D), nn.Linear(D, D))
        self.midi_embedding = nn.Embedding(MIDI_V, D)
        self.beats_embedding = nn.Embedding(BEATS_V, D)
        self.midi_proj = nn.Sequential(nn.Conv1d(D, D, 5, padding=2))
        self.beats_proj = nn.Sequential(nn.Conv1d(D, D, 5, padding=2))
        self.final_proj = nn.Conv1d(D, D, 1)
        self.proj_in = nn.Conv1d(IN_CH, D, 5, padding=2)
        self.layers = nn.ModuleList(
            [TBlock(D, HEADS, E, MULT) for _ in range(DEPTH)])
        self.final_layer = nn.Module()
        self.final_layer.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(D, 2 * D))
        self.final_layer.linear = nn.Linear(D, IN_CH)
        self.norm_final = nn.LayerNorm(D, elementwise_affine=False, eps=1e-6)

        hd = D // HEADS
        freqs = 1.0 / (10000 ** (torch.arange(0, hd, 2).float() / hd))
        t = torch.arange(MAX_LEN).float()
        self.freqs_cis = torch.polar(torch.ones(MAX_LEN, hd // 2),
                                     torch.outer(t, freqs))

    def forward(self, x, t, midi, beats, caption):
        me = self.midi_proj(self.midi_embedding(midi).transpose(1, 2))
        me = F.avg_pool1d(F.leaky_relu(me, 0.01), 2)
        be = self.beats_proj(self.beats_embedding(beats).transpose(1, 2))
        be = F.avg_pool1d(F.leaky_relu(be, 0.01), 2)
        acoustic = self.final_proj(me + be).transpose(1, 2)  # [B, T/2, D]
        h = self.proj_in(x).transpose(1, 2)
        T = h.shape[1]
        acoustic = acoustic[:, :T]
        t_emb = self.t_embedder(t)
        cap = self.c_embedder(caption)
        cap_emb = self.cap_embedder(cap.mean(1))
        adaln = t_emb + cap_emb
        h = acoustic + h
        for blk in self.layers:
            h = blk(h, cap, self.freqs_cis, adaln, t_emb, acoustic)
        mods = self.final_layer.adaLN_modulation(adaln).chunk(2, dim=1)
        h = self.norm_final(h) * (1 + mods[1].unsqueeze(1)) \
            + mods[0].unsqueeze(1)
        return self.final_layer.linear(h).transpose(1, 2)


def _run_parity(g, atol, rtol, t_mel=16):
    torch.manual_seed(0)
    with torch.no_grad():
        tm = TDiT(g).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "freqs_cis" not in k}
    params = convert_state_dict(sd, "dit")

    model = BandMoeDiT(in_channels=g["IN_CH"], context_dim=g["D"],
                       hidden_size=g["D"], depth=g["DEPTH"],
                       num_heads=g["HEADS"], max_len=g["MAX_LEN"],
                       num_experts=g["E"], ori_dim=g["ORI"],
                       multiple_of=g["MULT"])

    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, g["IN_CH"], t_mel // 2).astype(np.float32)
    t = np.array([17.0, 800.0], np.float32)
    midi = rng.randint(0, MIDI_V, (B, t_mel)).astype(np.int64)
    beats = rng.randint(0, BEATS_V, (B, t_mel)).astype(np.int64)
    caption = rng.randn(B, 5, g["ORI"]).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 torch.from_numpy(midi), torch.from_numpy(beats),
                 torch.from_numpy(caption)).numpy()

    ctx = {"c_concat": {"midi": jnp.asarray(midi)[:, None, :],
                        "beats": jnp.asarray(beats)[:, None, :]},
           "c_crossattn": jnp.asarray(caption)}
    out, lb = model.apply(params, jnp.asarray(x), jnp.asarray(t), ctx,
                          train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=atol, rtol=rtol)


def test_band_moe_dit_full_parity():
    _run_parity(TINY, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_band_moe_dit_shipped_geometry_parity():
    """VERDICT r2 item 1: the exact shipped width (768/d4/h8/E4/ori1024/20ch).

    Catches converter bugs that only manifest at size: expert stacking at E=4,
    head-split order at 8 heads, depth>1 block indexing, the ori_dim-1024
    caption projection. T is short (32 mel frames) to keep torch-CPU cost
    trivial; width is what matters. Wider accumulations warrant a slightly
    looser atol than the tiny case.
    """
    _run_parity(SHIPPED, atol=2e-3, rtol=1e-3, t_mel=32)
