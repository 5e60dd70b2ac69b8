"""Legacy 2-D VAE/VQ family: shapes, quantizer semantics, interfaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.autoencoder2d import (
    AutoencoderKL2D, VQModel, VQModelInterface, VectorQuantizer,
    IdentityFirstStage)

DD = dict(ch=8, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
          in_channels=1, resolution=32, z_channels=3, out_ch=1)


@pytest.mark.slow
def test_kl2d_roundtrip():
    m = AutoencoderKL2D(embed_dim=3, ddconfig=DD)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
    params = m.init({"params": jax.random.PRNGKey(1),
                     "gaussian": jax.random.PRNGKey(2)}, x)
    post = m.apply(params, x, method="encode")
    assert post.mean.shape == (1, 3, 8, 8)  # one 2x downsample
    rec = m.apply(params, post.mode(), method="decode")
    assert rec.shape == x.shape


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    zq, loss, idx = vq.apply(params, z)
    assert zq.shape == z.shape and idx.shape == (2, 5)
    assert float(loss) > 0
    # quantized values come from the codebook
    cb = np.asarray(params["params"]["embedding"])
    np.testing.assert_allclose(np.asarray(zq[0, 0]), cb[int(idx[0, 0])],
                               atol=1e-6)
    # straight-through: gradient wrt z is identity-ish (nonzero)
    g = jax.grad(lambda z: vq.apply(params, z)[0].sum())(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_vqmodel_and_interface():
    m = VQModel(embed_dim=3, n_embed=8, ddconfig=DD)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    rec, loss = m.apply(params, x)
    assert rec.shape == x.shape and float(loss) >= 0

    mi = VQModelInterface(embed_dim=3, n_embed=8, ddconfig=DD)
    pi = mi.init(jax.random.PRNGKey(1), x)
    h = mi.apply(pi, x, method="encode")
    assert h.shape == (1, 3, 8, 8)  # pre-quant latents
    dec = mi.apply(pi, h, method="decode")
    assert dec.shape == x.shape


def test_identity_first_stage():
    fs = IdentityFirstStage(vq_interface=True)
    x = np.ones(3)
    assert fs.encode(x) is x and fs.decode(x) is x
    q = fs.quantize(x)
    assert q[0] is x


def test_encoder2d_decoder2d_torch_parity():
    """Legacy 2-D KL family through the 'vae' converter: torch replica with
    the reference naming (model.py Encoder/Decoder: down.N.block/attn,
    down.N.downsample.conv, up.N.upsample.conv, mid.*) must reproduce the
    flax forward (validates the conv2d [O,I,H,W]->[H,W,I,O] layout path)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from versband_tpu.models.autoencoder2d import Encoder2D, Decoder2D
    from versband_tpu.utils.torch_convert import convert_state_dict

    CH, MULT, ZC = 32, (1, 2), 4

    def norm(c):
        return nn.GroupNorm(min(32, c), c, eps=1e-6)

    class TRes(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = norm(cin)
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = norm(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.nin_shortcut = (nn.Conv2d(cin, cout, 1)
                                 if cin != cout else None)

        def forward(self, x):
            h = self.conv1(F.silu(self.norm1(x)))
            h = self.conv2(F.silu(self.norm2(h)))
            if self.nin_shortcut is not None:
                x = self.nin_shortcut(x)
            return x + h

    class TAttn(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = norm(c)
            self.q = nn.Conv2d(c, c, 1)
            self.k = nn.Conv2d(c, c, 1)
            self.v = nn.Conv2d(c, c, 1)
            self.proj_out = nn.Conv2d(c, c, 1)

        def forward(self, x):
            B, C, H, W = x.shape
            h = self.norm(x)
            q = self.q(h).reshape(B, C, H * W)
            k = self.k(h).reshape(B, C, H * W)
            v = self.v(h).reshape(B, C, H * W)
            w = torch.softmax(torch.einsum("bci,bcj->bij", q, k) * C ** -0.5,
                              dim=-1)
            h = torch.einsum("bij,bcj->bci", w, v).reshape(B, C, H, W)
            return x + self.proj_out(h)

    class TDown(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, stride=2)

        def forward(self, x):
            return self.conv(F.pad(x, (0, 1, 0, 1)))

    class TUp(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))

    class TEncoder2D(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(3, CH, 3, padding=1)
            self.down = nn.ModuleList()
            cin = CH
            for i, m in enumerate(MULT):
                lvl = nn.Module()
                c = CH * m
                lvl.block = nn.ModuleList([TRes(cin, c), TRes(c, c)])
                lvl.attn = nn.ModuleList([TAttn(c), TAttn(c)])
                if i != len(MULT) - 1:
                    lvl.downsample = TDown(c)
                self.down.append(lvl)
                cin = c
            self.mid = nn.Module()
            self.mid.block_1 = TRes(cin, cin)
            self.mid.attn_1 = TAttn(cin)
            self.mid.block_2 = TRes(cin, cin)
            self.norm_out = norm(cin)
            self.conv_out = nn.Conv2d(cin, 2 * ZC, 3, padding=1)

        def forward(self, x):
            h = self.conv_in(x)
            for i, lvl in enumerate(self.down):
                for blk, att in zip(lvl.block, lvl.attn):
                    h = att(blk(h))
                if hasattr(lvl, "downsample"):
                    h = lvl.downsample(h)
            h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
            return self.conv_out(F.silu(self.norm_out(h)))

    class TDecoder2D(nn.Module):
        def __init__(self):
            super().__init__()
            c = CH * MULT[-1]
            self.conv_in = nn.Conv2d(ZC, c, 3, padding=1)
            self.mid = nn.Module()
            self.mid.block_1 = TRes(c, c)
            self.mid.attn_1 = TAttn(c)
            self.mid.block_2 = TRes(c, c)
            self.up = nn.ModuleList()
            cin = c
            for i in reversed(range(len(MULT))):
                lvl = nn.Module()
                cc = CH * MULT[i]
                lvl.block = nn.ModuleList(
                    [TRes(cin if j == 0 else cc, cc) for j in range(3)])
                if i != 0:
                    lvl.upsample = TUp(cc)
                self.up.insert(0, lvl)
                cin = cc
            self.norm_out = norm(CH * MULT[0])
            self.conv_out = nn.Conv2d(CH * MULT[0], 3, 3, padding=1)

        def forward(self, z):
            h = self.conv_in(z)
            h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
            for i in reversed(range(len(MULT))):
                lvl = self.up[i]
                for blk in lvl.block:
                    h = blk(h)
                if hasattr(lvl, "upsample"):
                    h = lvl.upsample(h)
            return self.conv_out(F.silu(self.norm_out(h)))

    torch.manual_seed(0)
    tenc, tdec = TEncoder2D().eval(), TDecoder2D().eval()
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy()
               for k, v in tdec.state_dict().items()})
    params = convert_state_dict(sd, "vae")

    enc = Encoder2D(ch=CH, ch_mult=MULT, num_res_blocks=2,
                    attn_resolutions=[16, 8], in_channels=3, resolution=16,
                    z_channels=ZC, double_z=True)
    dec = Decoder2D(ch=CH, ch_mult=MULT, num_res_blocks=2, out_ch=3,
                    z_channels=ZC)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    z = rng.randn(1, ZC, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_e = tenc(torch.from_numpy(x)).numpy()
        ref_d = tdec(torch.from_numpy(z)).numpy()

    # flax is channels-last
    out_e = enc.apply({"params": params["params"]["encoder"]},
                      jnp.moveaxis(jnp.asarray(x), 1, 3))
    out_d = dec.apply({"params": params["params"]["decoder"]},
                      jnp.moveaxis(jnp.asarray(z), 1, 3))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out_e), 3, 1), ref_e,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out_d), 3, 1), ref_d,
                               atol=2e-4, rtol=2e-4)
