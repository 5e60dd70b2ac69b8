"""HybridDiT2MLP2 torch parity through the 'concat_dit' converter family.

A torch replica with the REFERENCE's module naming (``concatDiT.py:413-530``
+ ``new_attention.py``: blocks.N.transformer_blocks.0.attn1.to_q,
ff.net.0.proj, code_proj.0, final_layer.conv1d, ...) is converted via
``convert_state_dict(..., 'concat_dit')`` and must reproduce the flax
forward for both cond_fuse modes.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from versband_tpu.models.concat_dit import HybridDiT2MLP2, ConcatDiT
from versband_tpu.utils.torch_convert import convert_state_dict

H, HEADS, DEPTH = 32, 2, 1
CTX = 12
CODE_NUM, CODEBOOKS = 16, 2
IN_CH, T_LAT, B = 4, 20, 2
MAXLEN = 64


class TTimestepEmbedder(nn.Module):
    def __init__(self, hidden, freq=256):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(freq, hidden), nn.SiLU(),
                                 nn.Linear(hidden, hidden))
        self.freq = freq

    def forward(self, t):
        half = self.freq // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


class TConditionEmbedder(nn.Module):
    def __init__(self, hidden, ctx):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(ctx, hidden),
                                 nn.GELU(approximate="tanh"),
                                 nn.Linear(hidden, hidden),
                                 nn.LayerNorm(hidden))

    def forward(self, x):
        return self.mlp(x)


class TPositionEmbedding(nn.Module):
    def __init__(self, n, d):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(n, d) * 0.02)

    def forward(self, x):
        return x + self.weight[None, :x.shape[1]]


class TCrossAttention(nn.Module):
    def __init__(self, dim, heads, dh):
        super().__init__()
        inner = heads * dh
        self.heads, self.scale = heads, dh ** -0.5
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        b, t, _ = x.shape
        h = self.heads
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        q = q.view(b, t, h, -1).transpose(1, 2)
        k = k.view(b, t, h, -1).transpose(1, 2)
        v = v.view(b, t, h, -1).transpose(1, 2)
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, -1)
        return self.to_out(out)


class TConv1dGEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, k=9):
        super().__init__()
        self.proj = nn.Conv1d(dim_in, dim_out * 2, k, padding=k // 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=1)
        return x * F.gelu(gate)


class TConvFF(nn.Module):
    def __init__(self, dim, mult=4, k=9):
        super().__init__()
        inner = dim * mult
        self.net = nn.Sequential(TConv1dGEGLU(dim, inner), nn.Dropout(0.0),
                                 nn.Conv1d(inner, dim, k, padding=k // 2))

    def forward(self, x):  # [B, C, T]
        return self.net(x)


class TBasicBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        dh = dim // heads
        self.attn1 = TCrossAttention(dim, heads, dh)
        self.attn2 = TCrossAttention(dim, heads, dh)
        self.ff = TConvFF(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x)) + x
        x = self.ff(self.norm3(x).permute(0, 2, 1)).permute(0, 2, 1) + x
        return x


class TTemporalTransformer(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm = nn.GroupNorm(32, dim, eps=1e-6)
        self.proj_in = nn.Conv1d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList([TBasicBlock(dim, heads)])
        self.proj_out = nn.Conv1d(dim, dim, 1)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x):  # [B, C, T]
        x_in = x
        x = self.proj_in(self.norm(x)).permute(0, 2, 1)
        for blk in self.transformer_blocks:
            x = blk(x)
        return self.proj_out(x.permute(0, 2, 1)) + x_in


class TConv1DFinalLayer(nn.Module):
    def __init__(self, hidden, out):
        super().__init__()
        self.norm_final = nn.GroupNorm(16, hidden)
        self.conv1d = nn.Conv1d(hidden, out, 1)

    def forward(self, x):
        return self.conv1d(self.norm_final(x))


class THybridDiT2MLP2(nn.Module):
    def __init__(self, cond_fuse):
        super().__init__()
        self.cond_fuse = cond_fuse
        self.code_num, self.codebook_num = CODE_NUM, CODEBOOKS
        self.t_embedder = TTimestepEmbedder(H)
        self.caption_embedder = TConditionEmbedder(H, CTX)
        self.pos_emb = TPositionEmbedding(MAXLEN, H)
        self.blocks = nn.ModuleList(
            [TTemporalTransformer(H, HEADS) for _ in range(DEPTH)])
        half = H // 2
        if cond_fuse == "concat_cut":
            self.code_embed = nn.Embedding(CODE_NUM * CODEBOOKS + 5,
                                           half // CODEBOOKS)
            self.code_proj = nn.Sequential(
                nn.Conv1d(half, half, 5, padding=2), nn.LeakyReLU(),
                nn.AvgPool1d(2))
            self.proj_in = nn.Conv1d(IN_CH, half, 5, padding=2)
            self.final_layer = TConv1DFinalLayer(half, IN_CH)
        else:  # concat_proj
            self.code_embed = nn.Embedding(CODE_NUM * CODEBOOKS + 5,
                                           H // CODEBOOKS)
            self.code_proj = nn.Sequential(
                nn.Conv1d(H, H, 5, padding=2), nn.LeakyReLU(), nn.AvgPool1d(2))
            self.proj_in = nn.Conv1d(IN_CH, H, 5, padding=2)
            self.fuse_proj = nn.Linear(2 * H, H)
            self.final_layer = TConv1DFinalLayer(H, IN_CH)

    def forward(self, x, t, context):
        t = self.t_embedder(t).unsqueeze(1)
        acoustic = context["c_concat"]
        caption = context["c_crossattn"]
        offsets = self.code_num * torch.arange(self.codebook_num)
        acoustic = acoustic + offsets[None, :, None]
        acoustic = torch.clamp(acoustic, max=3072)
        acoustic = self.code_embed(acoustic)          # [B,Q,T,e]
        acoustic = acoustic.transpose(2, 3).flatten(1, 2)  # [B, Q*e, T]
        acoustic = self.code_proj(acoustic).transpose(1, 2)
        caption = self.caption_embedder(caption)
        x = self.proj_in(x).transpose(1, 2)
        if abs(x.shape[1] - acoustic.shape[1]) <= 2:
            if x.shape[1] > acoustic.shape[1]:
                pad = acoustic[:, -1:].repeat(1, x.shape[1] - acoustic.shape[1], 1)
                acoustic = torch.cat([acoustic, pad], dim=1)
            else:
                acoustic = acoustic[:, :x.shape[1]]
        extra = caption.shape[1] + 1
        x = torch.cat([acoustic, x], dim=2)
        if self.cond_fuse == "concat_proj":
            x = self.fuse_proj(x)
        x = torch.cat([t, caption, x], dim=1)
        x = self.pos_emb(x).permute(0, 2, 1)
        for blk in self.blocks:
            x = blk(x)
        x = x[..., extra:]
        if self.cond_fuse == "concat_cut":
            x = x[:, H // 2:, :]
        return self.final_layer(x)


@pytest.mark.parametrize("fuse", ["concat_cut", "concat_proj"])
@pytest.mark.slow
def test_hybrid_dit2mlp2_torch_parity(fuse):
    torch.manual_seed(0)
    tm = THybridDiT2MLP2(fuse).eval()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, "concat_dit")

    fm = HybridDiT2MLP2(in_channels=IN_CH, context_dim=CTX, hidden_size=H,
                        depth=DEPTH, num_heads=HEADS, max_len=MAXLEN,
                        code_num=CODE_NUM, codebook_num=CODEBOOKS,
                        cond_fuse=fuse)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, IN_CH, T_LAT)).astype(np.float32)
    t = np.array([17.0, 431.0], np.float32)
    codes = rng.integers(0, CODE_NUM, (B, CODEBOOKS, 2 * T_LAT))
    caption = rng.standard_normal((B, 6, CTX)).astype(np.float32)
    ctx = {"c_concat": codes, "c_crossattn": caption}

    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t),
                 {"c_concat": torch.tensor(codes), "c_crossattn":
                  torch.tensor(caption)}).numpy()

    out, lb = fm.apply(params, jnp.asarray(x), jnp.asarray(t),
                       {"c_concat": jnp.asarray(codes),
                        "c_crossattn": jnp.asarray(caption)})
    assert float(lb) == 0.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_concat_dit_torch_parity_small():
    """ConcatDiT trunk parity: same converter family, caption-only path."""
    torch.manual_seed(3)

    class TConcatDiT(nn.Module):
        def __init__(self):
            super().__init__()
            self.t_embedder = TTimestepEmbedder(H)
            self.c_embedder = TConditionEmbedder(H, CTX)
            self.proj_in = nn.Conv1d(IN_CH, H, 5, padding=2)
            self.pos_emb = TPositionEmbedding(MAXLEN, H)
            self.blocks = nn.ModuleList(
                [TTemporalTransformer(H, HEADS) for _ in range(DEPTH)])
            self.final_layer = TConv1DFinalLayer(H, IN_CH)

        def forward(self, x, t, context):
            t = self.t_embedder(t).unsqueeze(1)
            c = self.c_embedder(context)
            extra = c.shape[1] + 1
            x = self.proj_in(x).permute(0, 2, 1)
            x = torch.cat([t, c, x], dim=1)
            x = self.pos_emb(x).permute(0, 2, 1)
            for blk in self.blocks:
                x = blk(x)
            return self.final_layer(x[..., extra:])

    tm = TConcatDiT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, "concat_dit")
    fm = ConcatDiT(in_channels=IN_CH, context_dim=CTX, hidden_size=H,
                   depth=DEPTH, num_heads=HEADS, max_len=MAXLEN)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((B, IN_CH, T_LAT)).astype(np.float32)
    t = np.array([3.0, 999.0], np.float32)
    caption = rng.standard_normal((B, 6, CTX)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(caption)).numpy()
    out, _ = fm.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(caption))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
