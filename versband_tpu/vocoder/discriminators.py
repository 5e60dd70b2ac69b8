"""Discriminator zoo for GAN training, TPU-native.

Re-designs of:
  * HiFi-GAN ``DiscriminatorP``/``MultiPeriodDiscriminator`` (periods
    2,3,5,7,11) and ``DiscriminatorS``/``MultiScaleDiscriminator``
    (``vocoder/hifigan/modules/hifigan.py:198-341``);
  * BigVGAN ``DiscriminatorR``/``MultiResolutionDiscriminator`` over STFT
    magnitudes (``vocoder/bigvgan/models.py:277-355``);
  * PatchGAN ``NLayerDiscriminator`` + ``ActNorm`` for the VAE mel GAN
    (``ldm/modules/discriminator/model.py:5-295``);
  * ``MultiWindowDiscriminator`` random mel-clip ensemble
    (``ldm/modules/discriminator/multi_window_disc.py:6-197``).

Layouts: waveforms [B, 1, T] at the public boundary, images NHWC internally.
Spectral norm is computed statelessly with 3 power iterations from a
deterministic start vector (the torch version carries a persistent ``u``; at
convergence both estimate sigma_max, and the stateless form keeps the train
step pure).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.vocoder.conv import LRELU_SLOPE, get_padding

Array = jax.Array


def _spectral_normalize(w: Array, iters: int = 3) -> Array:
    mat = w.reshape(-1, w.shape[-1])
    u = jnp.ones((mat.shape[0],), w.dtype) / np.sqrt(mat.shape[0])
    for _ in range(iters):
        v = mat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = mat @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (mat @ v)
    return w / (sigma + 1e-12)


class NormConv(fnn.Module):
    """Conv (1-D or 2-D by kernel rank) with weight- or spectral-norm."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: Sequence[Tuple[int, int]] = None
    groups: int = 1
    norm: str = "weight"  # 'weight' | 'spectral' | 'none'
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        nd = len(self.kernel_size)
        cin = x.shape[-1]
        shape = (*self.kernel_size, cin // self.groups, self.features)
        init = fnn.initializers.lecun_normal()
        if self.norm == "weight":
            v = self.param("kernel_v", init, shape, jnp.float32)
            g = self.param("kernel_g",
                           lambda key, s: jnp.linalg.norm(
                               v.reshape(-1, s[0]), axis=0), (self.features,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)),
                                    keepdims=True) + 1e-12)
            kernel = v / norm * g
        elif self.norm == "spectral":
            kernel = _spectral_normalize(self.param("kernel", init, shape,
                                                    jnp.float32))
        else:
            kernel = self.param("kernel", init, shape, jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (self.features,),
                          jnp.float32)
        dn = ("NWC", "WIO", "NWC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
        strides = self.strides or (1,) * nd
        padding = self.padding or [(0, 0)] * nd
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), strides, padding,
            feature_group_count=self.groups, dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(self.dtype)
        return out + bias.astype(self.dtype)


class DiscriminatorP(fnn.Module):
    """Period discriminator: fold wav into [T/p, p] and 2-D conv
    (``hifigan.py:198-240``). Returns (score [B, N], fmap list)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array):
        norm = "spectral" if self.use_spectral_norm else "weight"
        B, C, T = x.shape
        p = self.period
        if T % p:
            pad = p - T % p
            # torch reflect padding EXCLUDES the edge sample
            # (``hifigan.py:228``: appends x[T-2], x[T-3], ...)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
            T += pad
        h = x.reshape(B, C, T // p, p).transpose(0, 2, 3, 1)  # NHWC
        fmap = []
        chans = [32, 128, 512, 1024]
        for i, ch in enumerate(chans):
            h = NormConv(ch, (self.kernel_size, 1), (self.stride, 1),
                         [(get_padding(5, 1), get_padding(5, 1)), (0, 0)],
                         norm=norm, dtype=self.dtype, name=f"convs_{i}")(h)
            h = fnn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = NormConv(1024, (self.kernel_size, 1), (1, 1),
                     [(2, 2), (0, 0)], norm=norm, dtype=self.dtype,
                     name="convs_4")(h)
        h = fnn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = NormConv(1, (3, 1), (1, 1), [(1, 1), (0, 0)], norm=norm,
                     dtype=self.dtype, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(B, -1), fmap


class MultiPeriodDiscriminator(fnn.Module):
    """Periods (2,3,5,7,11) (``hifigan.py:243-268``)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, dtype=self.dtype, name=f"disc_{i}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r); fmap_rs.append(f_r)
            y_d_gs.append(s_g); fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(fnn.Module):
    """Scale discriminator: grouped long-kernel 1-D convs (``hifigan.py:271-304``)."""

    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array):
        norm = "spectral" if self.use_spectral_norm else "weight"
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)
        fmap = []
        spec = [(128, 15, 1, 1, 7), (128, 41, 2, 4, 20), (256, 41, 2, 16, 20),
                (512, 41, 4, 16, 20), (1024, 41, 4, 16, 20),
                (1024, 41, 1, 16, 20), (1024, 5, 1, 1, 2)]
        for i, (ch, k, s, g, pad) in enumerate(spec):
            h = NormConv(ch, (k,), (s,), [(pad, pad)], groups=g, norm=norm,
                         dtype=self.dtype, name=f"convs_{i}")(h)
            h = fnn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = NormConv(1, (3,), (1,), [(1, 1)], norm=norm, dtype=self.dtype,
                     name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiScaleDiscriminator(fnn.Module):
    """3 scales, first spectral-normed, avg-pool 4/2 between
    (``hifigan.py:307-341``)."""

    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                def pool(w):
                    wt = jnp.swapaxes(w, 1, 2)
                    wt = fnn.avg_pool(wt, (4,), strides=(2,), padding=((1, 1),))
                    return jnp.swapaxes(wt, 1, 2)
                y, y_hat = pool(y), pool(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0), dtype=self.dtype,
                               name=f"disc_{i}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r); fmap_rs.append(f_r)
            y_d_gs.append(s_g); fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def _stft_mag(x: Array, n_fft: int, hop: int, win: int) -> Array:
    """Reflect-padded center=False magnitude STFT of [B, T] (the
    DiscriminatorR spectrogram, ``bigvgan/models.py:320-331``)."""
    pad = (n_fft - hop) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    T = x.shape[1]
    n_frames = 1 + (T - n_fft) // hop
    idx = (np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None])
    frames = x[:, idx]  # [B, F, n_fft]
    window = jnp.asarray(np.hanning(win + 1)[:-1].astype(np.float32))
    if win < n_fft:
        lpad = (n_fft - win) // 2
        window = jnp.pad(window, (lpad, n_fft - win - lpad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.abs(spec).swapaxes(1, 2)  # [B, n_fft//2+1, frames]


class DiscriminatorR(fnn.Module):
    """One STFT-resolution discriminator (``bigvgan/models.py:277-331``)."""

    resolution: Sequence[int]  # (n_fft, hop, win)
    channel_mult: float = 1.0
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array):
        norm = "spectral" if self.use_spectral_norm else "weight"
        n_fft, hop, win = self.resolution
        mag = _stft_mag(x[:, 0, :], n_fft, hop, win)
        h = mag[..., None].transpose(0, 1, 2, 3)  # [B, F, TT, 1] NHWC
        ch = int(32 * self.channel_mult)
        fmap = []
        specs = [((3, 9), (1, 1)), ((3, 9), (1, 2)), ((3, 9), (1, 2)),
                 ((3, 9), (1, 2)), ((3, 3), (1, 1))]
        for i, (k, s) in enumerate(specs):
            h = NormConv(ch, k, s, [(k[0] // 2, k[0] // 2),
                                    (k[1] // 2, k[1] // 2)],
                         norm=norm, dtype=self.dtype, name=f"convs_{i}")(h)
            h = fnn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = NormConv(1, (3, 3), (1, 1), [(1, 1), (1, 1)], norm=norm,
                     dtype=self.dtype, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiResolutionDiscriminator(fnn.Module):
    """3 STFT resolutions (``bigvgan/models.py:332-355``)."""

    resolutions: Sequence[Sequence[int]] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    channel_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, res in enumerate(self.resolutions):
            d = DiscriminatorR(res, self.channel_mult, dtype=self.dtype,
                               name=f"disc_{i}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r); fmap_rs.append(f_r)
            y_d_gs.append(s_g); fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class ActNorm(fnn.Module):
    """Per-channel affine with data-dependent init
    (``ldm/modules/discriminator/model.py:5-70``). The torch version
    lazy-initializes from the first batch; here ``loc``/``scale`` start at
    0/1 and train — the steady-state behavior is identical."""

    num_features: int

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        loc = self.param("loc", fnn.initializers.zeros, (self.num_features,))
        scale = self.param("scale", fnn.initializers.ones, (self.num_features,))
        return scale * (x + loc)


class NLayerDiscriminator(fnn.Module):
    """PatchGAN on mel images [B, 1, H, W] -> logits [B, 1, H', W']
    (``ldm/modules/discriminator/model.py:217-295``)."""

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC
        kw, padw = 4, 1
        h = fnn.Conv(self.ndf, (kw, kw), strides=(2, 2),
                     padding=[(padw, padw)] * 2, dtype=self.dtype,
                     name="main_0")(h)
        h = fnn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers + 1):
            nf = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = fnn.Conv(self.ndf * nf, (kw, kw), strides=(stride, stride),
                         padding=[(padw, padw)] * 2, use_bias=self.use_actnorm,
                         dtype=self.dtype, name=f"main_{n}")(h)
            if self.use_actnorm:
                h = ActNorm(self.ndf * nf, name=f"norm_{n}")(h)
            else:
                h = fnn.BatchNorm(use_running_average=not train,
                                  dtype=self.dtype, name=f"norm_{n}")(h)
            h = fnn.leaky_relu(h, 0.2)
        h = fnn.Conv(1, (kw, kw), strides=(1, 1), padding=[(padw, padw)] * 2,
                     dtype=self.dtype, name="main_out")(h)
        return h.transpose(0, 3, 1, 2)


class MultiWindowDiscriminator(fnn.Module):
    """Random fixed-length mel clips -> 2-D conv towers, summed validity
    (``multi_window_disc.py:66-148``). Clip starts are drawn outside jit and
    passed in (`start_frames`), keeping the module pure."""

    time_lengths: Sequence[int] = (32, 64, 128)
    freq_length: int = 80
    hidden_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, start_frames: Sequence[int]):
        # x: [B, T, C] mel
        validity = 0.0
        feats = []
        for i, win in enumerate(self.time_lengths):
            s = start_frames[i]
            clip = jax.lax.dynamic_slice_in_dim(x, s, win, axis=1)
            h = clip[:, None, :, :].transpose(0, 2, 3, 1)  # NHWC [B, win, C, 1]
            for j, ch in enumerate((self.hidden_size // 4, self.hidden_size // 2,
                                    self.hidden_size)):
                h = fnn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name=f"tower{i}_conv{j}")(h)
                h = fnn.leaky_relu(h, 0.2)
            feats.append(h)
            h = h.reshape(h.shape[0], -1)
            v = fnn.Dense(1, dtype=self.dtype, name=f"tower{i}_out")(h)
            validity = validity + v
        return validity, feats


# --- loss helpers (``hifigan.py:344-382``, LSGAN form) ---------------------

def feature_loss(fmap_r, fmap_g) -> Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(real_outs, gen_outs) -> Tuple[Array, Array]:
    r_losses, g_losses = 0.0, 0.0
    for dr, dg in zip(real_outs, gen_outs):
        r_losses = r_losses + jnp.mean((1.0 - dr) ** 2)
        g_losses = g_losses + jnp.mean(dg ** 2)
    n = len(real_outs)
    return r_losses / n, g_losses / n


def generator_loss(disc_outputs) -> Array:
    loss = 0.0
    for dg in disc_outputs:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss / len(disc_outputs)


def cond_discriminator_loss(outputs) -> Array:
    loss = 0.0
    for dg in outputs:
        loss = loss + jnp.mean(dg ** 2)
    return loss / len(outputs)
