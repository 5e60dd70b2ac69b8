"""1-D KL-VAE mel codec, TPU-native.

Re-design of ``ldm/models/autoencoder1d.py`` (AutoencoderKL, Encoder1D, Decoder1D,
ResnetBlock1D, AttnBlock1D, Up/Downsample1D). Shipped config
(``configs/ae_accomp.yaml:5-23``): 80-bin mel <-> 20-ch latent, ch 384,
ch_mult (1,2,4), 2 res blocks, kernel 5, single 2x temporal downsample at level 0,
mid-block single-head attention, GroupNorm(32)+swish.

TPU notes: all convs run feature-last ``[B, T, C]`` (XLA's native 1-D conv layout);
the public ``encode``/``decode`` API keeps the reference's channel-first ``[B, C, T]``
mel/latent layout. Faithfully preserves the reference's kernel-size asymmetry
(encoder res blocks use the configured kernel (5), decoder res blocks use the
default 3 — ``autoencoder1d.py:456-460`` omits kernel_size) so torch checkpoints
convert 1:1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from versband_tpu.models.distributions import DiagonalGaussian

Array = jax.Array


def _norm(name: str, dtype=jnp.float32, channels: int | None = None):
    # GroupNorm(32) as in the reference's Normalize (autoencoder1d.py:165-166);
    # degrade gracefully for tiny test widths
    groups = 32 if channels is None or channels >= 32 else channels
    return fnn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype, name=name)


def _swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


class ResnetBlock1D(fnn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    kernel_size: int = 3
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        out_ch = self.out_channels or self.in_channels
        h = _norm("norm1", self.dtype, self.in_channels)(x)
        h = _swish(h)
        h = fnn.Conv(out_ch, (self.kernel_size,), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = _norm("norm2", self.dtype, out_ch)(h)
        h = _swish(h)
        if self.dropout > 0:
            h = fnn.Dropout(self.dropout)(h, deterministic=not train)
        h = fnn.Conv(out_ch, (self.kernel_size,), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            x = fnn.Conv(out_ch, (1,), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock1D(fnn.Module):
    """Single-head full self-attention over time with 1x1-conv projections."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = _norm("norm", self.dtype, self.in_channels)(x)
        q = fnn.Conv(self.in_channels, (1,), dtype=self.dtype, name="q")(h)
        k = fnn.Conv(self.in_channels, (1,), dtype=self.dtype, name="k")(h)
        v = fnn.Conv(self.in_channels, (1,), dtype=self.dtype, name="v")(h)
        scale = self.in_channels ** -0.5
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        h = jnp.einsum("bqk,bkc->bqc", w, v, preferred_element_type=jnp.float32).astype(x.dtype)
        h = fnn.Conv(self.in_channels, (1,), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample1D(fnn.Module):
    in_channels: int
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        if self.with_conv:
            # asymmetric (0,1) pad then stride-2 valid conv, as in the reference
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
            return fnn.Conv(self.in_channels, (3,), strides=(2,), padding="VALID",
                            dtype=self.dtype, name="conv")(x)
        return fnn.avg_pool(x, (2,), strides=(2,))


class Upsample1D(fnn.Module):
    in_channels: int
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        B, T, C = x.shape
        x = jnp.repeat(x, 2, axis=1)  # nearest-neighbor 2x in time
        if self.with_conv:
            x = fnn.Conv(self.in_channels, (3,), padding="SAME", dtype=self.dtype, name="conv")(x)
        return x


class Encoder1D(fnn.Module):
    ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_layers: Sequence[int] = ()
    down_layers: Sequence[int] = ()
    in_channels: int = 80
    z_channels: int = 20
    double_z: bool = True
    kernel_size: int = 3
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """[B, T, in_channels] -> [B, T', 2*z_channels]"""
        k = self.kernel_size
        h = fnn.Conv(self.ch, (k,), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        in_mult = (1,) + tuple(self.ch_mult)
        for i_level in range(len(self.ch_mult)):
            block_in = self.ch * in_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock1D(
                    in_channels=block_in if i_block == 0 else block_out,
                    out_channels=block_out, kernel_size=k, dropout=self.dropout,
                    dtype=self.dtype, name=f"down_{i_level}_block_{i_block}",
                )(h, train)
                if i_level in self.attn_layers:
                    h = AttnBlock1D(block_out, dtype=self.dtype,
                                    name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level in self.down_layers:
                h = Downsample1D(block_out, dtype=self.dtype,
                                 name=f"down_{i_level}_downsample")(h)
        block_in = self.ch * self.ch_mult[-1]
        h = ResnetBlock1D(in_channels=block_in, kernel_size=k, dropout=self.dropout,
                          dtype=self.dtype, name="mid_block_1")(h, train)
        h = AttnBlock1D(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock1D(in_channels=block_in, kernel_size=k, dropout=self.dropout,
                          dtype=self.dtype, name="mid_block_2")(h, train)
        h = _norm("norm_out", self.dtype, block_in)(h)
        h = _swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return fnn.Conv(out_ch, (k,), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class Decoder1D(fnn.Module):
    ch: int
    out_ch: int = 80
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_layers: Sequence[int] = ()
    down_layers: Sequence[int] = ()
    z_channels: int = 20
    kernel_size: int = 3
    dropout: float = 0.0
    tanh_out: bool = False
    give_pre_end: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        """[B, T', z_channels] -> [B, T, out_ch]"""
        k = self.kernel_size
        num_layers = len(self.ch_mult)
        # each encoder downsample shifts the matching decoder upsample one level up
        up_layers = [i + 1 for i in self.down_layers]
        block_in = self.ch * self.ch_mult[-1]
        h = fnn.Conv(block_in, (k,), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        # NB: decoder res blocks use default kernel 3 (reference asymmetry)
        h = ResnetBlock1D(in_channels=block_in, dropout=self.dropout,
                          dtype=self.dtype, name="mid_block_1")(h, train)
        h = AttnBlock1D(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock1D(in_channels=block_in, dropout=self.dropout,
                          dtype=self.dtype, name="mid_block_2")(h, train)
        for i_level in reversed(range(num_layers)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock1D(
                    in_channels=block_in if i_block == 0 else block_out,
                    out_channels=block_out, dropout=self.dropout,
                    dtype=self.dtype, name=f"up_{i_level}_block_{i_block}",
                )(h, train)
                if i_level in self.attn_layers:
                    h = AttnBlock1D(block_out, dtype=self.dtype,
                                    name=f"up_{i_level}_attn_{i_block}")(h)
            block_in = block_out
            if i_level in up_layers:
                h = Upsample1D(block_in, dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        if self.give_pre_end:
            return h
        h = _norm("norm_out", self.dtype, block_in)(h)
        h = _swish(h)
        h = fnn.Conv(self.out_ch, (k,), padding="SAME", dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


class AutoencoderKL(fnn.Module):
    """KL-VAE over mel spectrograms. Public API is channel-first like the
    reference: ``encode: [B, 80, T] -> DiagonalGaussian(2*embed_dim ch)``,
    ``decode: [B, embed_dim, T/2] -> [B, 80, T]`` (``autoencoder1d.py:49-58``).
    """

    embed_dim: int
    ddconfig: Any = None
    lossconfig: Any = None
    ckpt_path: Optional[str] = None
    ignore_keys: Sequence[str] = ()
    image_key: str = "image"
    monitor: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig or {})
        assert dd.get("double_z", True)
        common = dict(
            ch=dd["ch"], ch_mult=tuple(dd.get("ch_mult", (1, 2, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_layers=tuple(dd.get("attn_layers", ())),
            down_layers=tuple(dd.get("down_layers", ())),
            z_channels=dd["z_channels"], kernel_size=dd.get("kernel_size", 3),
            dropout=dd.get("dropout", 0.0), dtype=self.dtype,
        )
        self.encoder = Encoder1D(in_channels=dd["in_channels"],
                                 double_z=dd.get("double_z", True), **common)
        self.decoder = Decoder1D(out_ch=dd["out_ch"], **common)
        self.quant_conv = fnn.Conv(2 * self.embed_dim, (1,), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = fnn.Conv(dd["z_channels"], (1,), dtype=self.dtype,
                                        name="post_quant_conv")
        self.downsample_factor = 2 ** len(common["down_layers"])

    def encode(self, x: Array, train: bool = False) -> DiagonalGaussian:
        h = self.encoder(jnp.swapaxes(x, 1, 2), train)
        moments = self.quant_conv(h)  # [B, T', 2*embed_dim]
        return DiagonalGaussian(jnp.swapaxes(moments, 1, 2), channel_axis=1)

    def decode(self, z: Array, train: bool = False) -> Array:
        h = self.post_quant_conv(jnp.swapaxes(z, 1, 2))
        dec = self.decoder(h, train)
        return jnp.swapaxes(dec, 1, 2)

    def __call__(self, x: Array, rng: Optional[jax.Array] = None,
                 sample_posterior: bool = True, train: bool = False
                 ) -> Tuple[Array, DiagonalGaussian]:
        posterior = self.encode(x, train)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z, train), posterior
