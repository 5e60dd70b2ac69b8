"""Legacy 2-D autoencoder family (capability parity).

Re-design of ``ldm/models/autoencoder.py:15-506`` and the 2-D UNet blocks of
``ldm/modules/diffusionmodules/model.py`` (Encoder/Decoder/AttnBlock):
``AutoencoderKL2D``, ``VQModel`` (+ ``VQModelInterface``), and
``IdentityFirstStage`` — used by the 2-D LDM configs and the isinstance
dispatch in the diffusion wrapper (``ddpm.py:23``). Images are channel-first
``[B, C, H, W]`` at the public boundary, NHWC internally.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.models.distributions import DiagonalGaussian

Array = jax.Array


def _norm(name, ch):
    return fnn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6, name=name)


def _swish(x):
    return x * fnn.sigmoid(x)


class ResnetBlock2D(fnn.Module):
    in_channels: int
    out_channels: Optional[int] = None

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.out_channels or self.in_channels
        h = _norm("norm1", self.in_channels)(x)
        h = fnn.Conv(out_ch, (3, 3), padding="SAME", name="conv1")(_swish(h))
        h = _norm("norm2", out_ch)(h)
        h = fnn.Conv(out_ch, (3, 3), padding="SAME", name="conv2")(_swish(h))
        if self.in_channels != out_ch:
            x = fnn.Conv(out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock2D(fnn.Module):
    in_channels: int

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        h = _norm("norm", C)(x)
        q = fnn.Conv(C, (1, 1), name="q")(h).reshape(B, H * W, C)
        k = fnn.Conv(C, (1, 1), name="k")(h).reshape(B, H * W, C)
        v = fnn.Conv(C, (1, 1), name="v")(h).reshape(B, H * W, C)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) * C ** -0.5, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        return x + fnn.Conv(C, (1, 1), name="proj_out")(h)


class Downsample2D(fnn.Module):
    """stride-2 conv with the torch (0,1) asymmetric pad
    (``diffusionmodules/model.py`` Downsample); nested ``conv`` matches the
    reference key ``down.N.downsample.conv`` for 1:1 conversion."""

    ch: int

    @fnn.compact
    def __call__(self, h: Array) -> Array:
        return fnn.Conv(self.ch, (3, 3), strides=(2, 2),
                        padding=[(0, 1), (0, 1)], name="conv")(h)


class Upsample2D(fnn.Module):
    """nearest-2x + conv (``diffusionmodules/model.py`` Upsample)."""

    ch: int

    @fnn.compact
    def __call__(self, h: Array) -> Array:
        B, H, W, C = h.shape
        h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
        return fnn.Conv(self.ch, (3, 3), padding="SAME", name="conv")(h)


class Encoder2D(fnn.Module):
    ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = fnn.Conv(self.ch, (3, 3), padding="SAME", name="conv_in")(x)
        res = self.resolution
        for i, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for j in range(self.num_res_blocks):
                h = ResnetBlock2D(h.shape[-1], ch,
                                  name=f"down_{i}_block_{j}")(h)
                if res in self.attn_resolutions:
                    h = AttnBlock2D(ch, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample2D(ch, name=f"down_{i}_downsample")(h)
                res //= 2
        ch = h.shape[-1]
        h = ResnetBlock2D(ch, name="mid_block_1")(h)
        h = AttnBlock2D(ch, name="mid_attn_1")(h)
        h = ResnetBlock2D(ch, name="mid_block_2")(h)
        h = _norm("norm_out", ch)(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return fnn.Conv(out_ch, (3, 3), padding="SAME",
                        name="conv_out")(_swish(h))


class Decoder2D(fnn.Module):
    ch: int
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4

    @fnn.compact
    def __call__(self, z: Array) -> Array:
        ch = self.ch * self.ch_mult[-1]
        h = fnn.Conv(ch, (3, 3), padding="SAME", name="conv_in")(z)
        h = ResnetBlock2D(ch, name="mid_block_1")(h)
        h = AttnBlock2D(ch, name="mid_attn_1")(h)
        h = ResnetBlock2D(ch, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            ch = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock2D(h.shape[-1], ch, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample2D(h.shape[-1], name=f"up_{i}_upsample")(h)
        h = _norm("norm_out", h.shape[-1])(h)
        return fnn.Conv(self.out_ch, (3, 3), padding="SAME",
                        name="conv_out")(_swish(h))


class VectorQuantizer(fnn.Module):
    """Nearest-codebook quantizer with straight-through gradients and the
    commitment/codebook loss (taming-transformers semantics)."""

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @fnn.compact
    def __call__(self, z: Array) -> Tuple[Array, Array, Array]:
        codebook = self.param(
            "embedding", fnn.initializers.uniform(2.0 / self.n_embed),
            (self.n_embed, self.embed_dim))
        flat = z.reshape(-1, self.embed_dim)
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ codebook.T + jnp.sum(codebook ** 2, 1))
        idx = jnp.argmin(d, axis=1)
        zq = codebook[idx].reshape(z.shape)
        loss = (self.beta * jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
                + jnp.mean((zq - jax.lax.stop_gradient(z)) ** 2))
        zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
        return zq, loss, idx.reshape(z.shape[:-1])


class AutoencoderKL2D(fnn.Module):
    """2-D KL autoencoder (``ldm/models/autoencoder.py:285-403`` shape)."""

    embed_dim: int
    ddconfig: Any = None
    lossconfig: Any = None
    ckpt_path: Optional[str] = None
    image_key: str = "image"
    monitor: Optional[str] = None

    def setup(self):
        dd = dict(self.ddconfig or {})
        self.encoder = Encoder2D(
            ch=dd["ch"], ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 8))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            in_channels=dd.get("in_channels", 3),
            resolution=dd.get("resolution", 256),
            z_channels=dd["z_channels"], double_z=dd.get("double_z", True))
        self.decoder = Decoder2D(
            ch=dd["ch"], out_ch=dd.get("out_ch", 3),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 8))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            z_channels=dd["z_channels"])
        self.quant_conv = fnn.Conv(2 * self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = fnn.Conv(dd["z_channels"], (1, 1),
                                        name="post_quant_conv")

    def encode(self, x: Array) -> DiagonalGaussian:
        h = self.encoder(jnp.transpose(x, (0, 2, 3, 1)))
        moments = jnp.transpose(self.quant_conv(h), (0, 3, 1, 2))
        return DiagonalGaussian(moments, channel_axis=1)

    def decode(self, z: Array) -> Array:
        h = self.post_quant_conv(jnp.transpose(z, (0, 2, 3, 1)))
        return jnp.transpose(self.decoder(h), (0, 3, 1, 2))

    def __call__(self, x: Array, rng: Optional[jax.Array] = None,
                 sample_posterior: bool = True):
        post = self.encode(x)
        if sample_posterior:
            z = post.sample(rng if rng is not None else self.make_rng("gaussian"))
        else:
            z = post.mode()
        return self.decode(z), post


class VQModel(fnn.Module):
    """2-D VQ autoencoder (``ldm/models/autoencoder.py:15-282`` shape)."""

    embed_dim: int
    n_embed: int
    ddconfig: Any = None
    lossconfig: Any = None
    ckpt_path: Optional[str] = None
    monitor: Optional[str] = None

    def setup(self):
        dd = dict(self.ddconfig or {})
        self.encoder = Encoder2D(
            ch=dd["ch"], ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 8))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            in_channels=dd.get("in_channels", 3),
            resolution=dd.get("resolution", 256),
            z_channels=dd["z_channels"], double_z=False)
        self.decoder = Decoder2D(
            ch=dd["ch"], out_ch=dd.get("out_ch", 3),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 8))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            z_channels=dd["z_channels"])
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)
        self.quant_conv = fnn.Conv(self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = fnn.Conv(dd["z_channels"], (1, 1),
                                        name="post_quant_conv")

    def encode_quantized(self, x: Array):
        h = self.quant_conv(self.encoder(jnp.transpose(x, (0, 2, 3, 1))))
        zq, loss, idx = self.quantize(h)
        return jnp.transpose(zq, (0, 3, 1, 2)), loss, idx

    def encode(self, x: Array):
        return self.encode_quantized(x)

    def encode_pre_quant(self, x: Array) -> Array:
        """VQModelInterface.encode: return pre-quantization latents
        (``autoencoder.py:244-249``)."""
        h = self.quant_conv(self.encoder(jnp.transpose(x, (0, 2, 3, 1))))
        return jnp.transpose(h, (0, 3, 1, 2))

    def decode(self, z: Array, force_not_quantize: bool = False) -> Array:
        h = jnp.transpose(z, (0, 2, 3, 1))
        if not force_not_quantize:
            h, _, _ = self.quantize(h)
        return jnp.transpose(
            self.decoder(self.post_quant_conv(h)), (0, 3, 1, 2))

    def __call__(self, x: Array):
        zq, loss, _ = self.encode_quantized(x)
        return self.decode(zq, force_not_quantize=True), loss


class VQModelInterface(VQModel):
    """First-stage interface: encode without quantization, quantize at decode
    (``autoencoder.py:243-282``)."""

    def encode(self, x: Array) -> Array:  # type: ignore[override]
        return self.encode_pre_quant(x)


class IdentityFirstStage:
    """Pass-through first stage (``autoencoder.py:488-506``)."""

    def __init__(self, *args, vq_interface: bool = False, **kwargs):
        self.vq_interface = vq_interface

    def encode(self, x, *a, **k):
        return x

    def decode(self, x, *a, **k):
        return x

    def quantize(self, x, *a, **k):
        if self.vq_interface:
            return x, None, [None, None, None]
        return x

    def __call__(self, x, *a, **k):
        return x
