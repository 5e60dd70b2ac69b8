"""BigVGAN vocoder, TPU-native.

Re-design of ``vocoder/bigvgan/models.py`` (AMPBlock1/2 :30-131, generator
:133-213, wrapper :393-414), ``activations.py`` (Snake :48-59, SnakeBeta
:63-121: ``x + 1/b * sin^2(a x)``), and the alias-free resampling stack
(``alias_free_torch/{filter,resample}.py``: kaiser-windowed sinc lowpass,
2x up -> activation -> 2x down).

TPU decisions:
  * channel-last layout; the kaiser-sinc filters are host-precomputed numpy
    constants baked into the graph (static kernel sizes);
  * the anti-alias up/downsample is a *depthwise* filter — cheap VPU work — so
    it uses plain zero-stuffed/strided depthwise convs (not worth a polyphase
    rewrite); the expensive channel-mixing upsamplers use the polyphase
    transposed conv from versband_tpu.vocoder.conv;
  * Snake is computed in fp32 (sin^2 under bf16 loses the periodic detail).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.vocoder.conv import (
    WNConv1d, WNConvTranspose1d, fold_weight_norm)

Array = jax.Array


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass, sum-normalized (``filter.py:28-57``)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(x: Array, filt, stride: int = 1) -> Array:
    """Depthwise conv of [B, T, C] with a shared 1-D filter.

    NOTE a tap-unrolled shifted-add formulation was tried and measured 8x
    SLOWER end to end (1.2 s vs 140 ms for a 20 s BigVGAN vocode): XLA
    materializes every per-tap fp32 intermediate, turning a streaming filter
    into ~2 GB of HBM traffic per activation. The single fused conv op is
    the right primitive here; the remaining headroom is a Pallas
    up->snake->down fusion, not a lowering tweak.
    """
    filt = jnp.asarray(np.asarray(filt, np.float32))
    C = x.shape[-1]
    k = filt.shape[0]
    kernel = jnp.tile(filt.reshape(k, 1, -1), (1, 1, C))
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride,), padding=[(0, 0)],
        feature_group_count=C, dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _replicate_pad(x: Array, left: int, right: int) -> Array:
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


class UpSample1d(fnn.Module):
    """ratio-x kaiser-sinc upsample (``resample.py:10-33``)."""

    ratio: int = 2
    kernel_size: Optional[int] = None

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        r = self.ratio
        k = self.kernel_size or int(6 * r // 2) * 2
        pad = k // r - 1
        pad_left = pad * r + (k - r) // 2
        pad_right = pad * r + (k - r + 1) // 2
        filt = kaiser_sinc_filter1d(0.5 / r, 0.6 / r, k)  # host numpy taps

        x = _replicate_pad(x, pad, pad)
        B, T, C = x.shape
        # zero-stuff by ratio then full (transposed) correlation with the filter
        stuffed = jnp.zeros((B, T * r, C), x.dtype).at[:, ::r].set(x)
        # torch conv_transpose1d(stride=r) output covers (T-1)*r + k samples;
        # emulate with zero-stuffed conv over a (k-1)-padded sequence.
        stuffed = jnp.pad(stuffed, ((0, 0), (k - 1, k - 1), (0, 0)))[:, : (T - 1) * r + k + k - 1]
        y = r * _depthwise_conv(stuffed, filt[::-1].copy())
        return y[:, pad_left: y.shape[1] - pad_right]


class DownSample1d(fnn.Module):
    """ratio-x kaiser-sinc lowpass + decimate (``resample.py:36-49``)."""

    ratio: int = 2
    kernel_size: Optional[int] = None

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        r = self.ratio
        k = self.kernel_size or int(6 * r // 2) * 2
        even = k % 2 == 0
        pad_left = k // 2 - int(even)
        pad_right = k // 2
        filt = kaiser_sinc_filter1d(0.5 / r, 0.6 / r, k)  # host numpy taps
        x = _replicate_pad(x, pad_left, pad_right)
        return _depthwise_conv(x, filt, stride=r)


def snake(x: Array, alpha: Array, beta: Optional[Array] = None,
          logscale: bool = True) -> Array:
    """Snake / SnakeBeta: ``x + 1/beta * sin^2(alpha x)`` (``activations.py``),
    fp32 inner math."""
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    b = a if beta is None else beta.astype(jnp.float32)
    if logscale:
        a, b = jnp.exp(a), jnp.exp(b)
    y = xf + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(xf * a))
    return y.astype(x.dtype)


def alias_free_snake_polyphase(x: Array, alpha: Array,
                               beta: Optional[Array], logscale: bool,
                               kernel_size: int = 12) -> Optional[Array]:
    """2x-up -> snake -> 2x-down as four stride-1 polyphase FIRs on the MXU.

    Never materializes the [B, 2T, C] upsampled signal: the two output
    phases of the up-FIR (``ye``, ``yo``) are 6-tap stride-1 convs of x, and
    the decimating down-FIR reads them phase-wise, so the whole chain is
    4 depthwise convs at length T + the pointwise snake (closed form in
    ``ops/fused_act1d.py``'s docstring). Each depthwise FIR runs as a dense
    diag-expanded space-to-depth conv (``vocoder/conv.py``) — channel-packed
    [T/r, rC] matmuls on the MXU. vs the Pallas fused kernel this pays ~2
    intermediates of traffic but has NO per-grid-step overhead, no VMEM
    padding waste at C<128, and no T-divisibility constraints — measured
    much faster at every vocoder-tail shape (docs/BENCH_NOTES.md).

    Boundary frames (zero-pad vs the reference's replicate-pad, reach 2q)
    are recomputed exactly by ``_edge_fix``.
    """
    from versband_tpu.ops.fused_act1d import _edge_fix
    from versband_tpu.vocoder.conv import space_to_depth_conv1d

    B, T, C = x.shape
    k = kernel_size
    if k % 4 != 0:
        return None
    q = k // 4
    n_half = k // 2
    nt = n_half + 1  # both phases in one stencil: offsets -q .. n_half - q
    taps = kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, k)  # host numpy
    g = 2.0 * taps
    # ONE up conv [T,C]->[T,2C] carrying both polyphase outputs
    # (cols [:C] = ye at taps g[k-1-2a] offset a-q; cols [C:] = yo at taps
    # g[k-2-2a] offset a-q+1) and ONE down conv [T,2C]->[T,C] summing
    # f[2b]*so + f[2b+1]*se — the whole activation is conv -> snake -> conv.
    w_up = np.zeros((nt, C, 2 * C), np.float32)
    w_dn = np.zeros((nt, 2 * C, C), np.float32)
    cc = np.arange(C)
    for t_ in range(n_half):
        w_up[t_, cc, cc] = g[k - 1 - 2 * t_]          # ye <- x
        w_up[t_ + 1, cc, C + cc] = g[k - 2 - 2 * t_]  # yo <- x
        w_dn[t_, C + cc, cc] = taps[2 * t_]           # out <- so
        w_dn[t_ + 1, cc, cc] = taps[2 * t_ + 1]       # out <- se
    w_up, w_dn = jnp.asarray(w_up), jnp.asarray(w_dn)

    # pack channels to the full 128-lane width: XLA pads conv channel dims
    # to 128, so half-width operands burn FLOPs for nothing (measured
    # 2.56 -> 1.28 ms per FIR at T=481k C=32 doubling the packing)
    def pick_r(ch):
        r = 1
        while 2 * r * ch <= 128 and T % (2 * r) == 0:
            r *= 2
        return r

    def fir(v, w, pad):
        # stencil offsets tap - pad (asymmetric ok in both branches)
        r = pick_r(v.shape[-1])
        if r > 1:
            return space_to_depth_conv1d(v, w, 1, pad, r, v.dtype)
        return jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), window_strides=(1,),
            padding=[(pad, w.shape[0] - 1 - pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(v.dtype)

    y = fir(x, w_up, q)                      # [B, T, 2C] = [ye | yo]
    a2 = jnp.concatenate([alpha, alpha])
    b2 = None if beta is None else jnp.concatenate([beta, beta])
    s = snake(y, a2, b2, logscale)           # [se | so]
    out = fir(s, w_dn, q)

    af = alpha.astype(jnp.float32)
    bf = af if beta is None else beta.astype(jnp.float32)
    if logscale:
        af, bf = jnp.exp(af), jnp.exp(bf)
    return _edge_fix(x, af, 1.0 / (bf + 1e-9), np.asarray(taps), out,
                     edge=2 * q)


class Activation1d(fnn.Module):
    """2x upsample -> snake(-beta) -> 2x downsample (``alias_free_torch/act.py``).

    ``use_fused`` (default): the packed-lane Pallas kernel
    (``ops/fused_act1d.py``) — one HBM read+write, exact fp32 edges
    in-kernel; the polyphase MXU formulation above as the second choice
    (first at unpackable bf16 widths); unfused modules when neither fits.
    """

    channels: int
    variant: str = "snakebeta"  # 'snake' | 'snakebeta'
    logscale: bool = True
    use_fused: bool = True

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        init = fnn.initializers.zeros if self.logscale else fnn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,), jnp.float32)
        beta = None
        if self.variant == "snakebeta":
            beta = self.param("beta", init, (self.channels,), jnp.float32)
        if self.use_fused and not self.is_initializing():
            from versband_tpu.ops.fused_act1d import fused_alias_free_snake

            # packed-lane Pallas kernel first (fastest everywhere packing
            # applies: 6.9 vs 20.9/79.1 ms at the C=32 tail, exact fp32);
            # MXU polyphase convs as the shape-robust second choice AND
            # the first choice at unpackable bf16 widths (C>128 => r=1,
            # where the kernel measured 0.89-1.2 vs 0.38 ms at C=256);
            # unfused modules as the last resort
            bf16_wide = x.dtype == jnp.bfloat16 and x.shape[-1] > 128
            order = ([alias_free_snake_polyphase, fused_alias_free_snake]
                     if bf16_wide else
                     [fused_alias_free_snake, alias_free_snake_polyphase])
            for impl in order:
                out = impl(x, alpha, beta, self.logscale)
                if out is not None:
                    return out
        x = UpSample1d(2, name="upsample")(x)
        x = snake(x, alpha, beta, self.logscale)
        return DownSample1d(2, name="downsample")(x)


class AMPBlock1(fnn.Module):
    """3x (act-conv-act-conv) residual units, dilations (1,3,5) (``models.py:30-88``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_weight_norm: bool = True
    use_fused: bool = True  # Pallas fused activation: inference-only (no VJP)
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dilations):
            h = Activation1d(self.channels, self.activation,
                             self.snake_logscale, self.use_fused,
                             name=f"acts1_{i}")(x)
            h = WNConv1d(self.channels, self.kernel_size, dilation=d,
                         use_weight_norm=self.use_weight_norm, init_std=0.01,
                         dtype=self.dtype, name=f"convs1_{i}")(h)
            h = Activation1d(self.channels, self.activation,
                             self.snake_logscale, self.use_fused,
                             name=f"acts2_{i}")(h)
            h = WNConv1d(self.channels, self.kernel_size, dilation=1,
                         use_weight_norm=self.use_weight_norm, init_std=0.01,
                         dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class AMPBlock2(fnn.Module):
    """2x (act-conv) residual units, dilations (1,3) (``models.py:91-131``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_weight_norm: bool = True
    use_fused: bool = True  # Pallas fused activation: inference-only (no VJP)
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dilations):
            h = Activation1d(self.channels, self.activation,
                             self.snake_logscale, self.use_fused,
                             name=f"acts_{i}")(x)
            h = WNConv1d(self.channels, self.kernel_size, dilation=d,
                         use_weight_norm=self.use_weight_norm, init_std=0.01,
                         dtype=self.dtype, name=f"convs_{i}")(h)
            x = x + h
        return x


class BigVGANGenerator(fnn.Module):
    """mel [B, num_mels, T] -> wav [B, T*prod(rates)] (``models.py:133-205``)."""

    num_mels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 4, 4)
    upsample_kernel_sizes: Sequence[int] = (9, 8, 8, 8)
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_weight_norm: bool = True
    use_fused: bool = True  # set False to TRAIN (the Pallas kernel has no VJP)
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, mel: Array) -> Array:
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)
        x = WNConv1d(self.upsample_initial_channel, 7,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_pre")(x)
        amp_cls = AMPBlock1 if self.resblock == "1" else AMPBlock2
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = WNConvTranspose1d(ch, k, u,
                                  use_weight_norm=self.use_weight_norm,
                                  dtype=self.dtype, name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                h = amp_cls(ch, rk, tuple(rd), self.activation,
                            self.snake_logscale, self.use_weight_norm,
                            use_fused=self.use_fused,
                            dtype=self.dtype, name=f"resblocks_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = Activation1d(ch, self.activation, self.snake_logscale,
                         self.use_fused, name="activation_post")(x)
        x = WNConv1d(1, 7, use_weight_norm=self.use_weight_norm, init_std=0.01,
                     dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class VocoderBigVGAN:
    """Runtime wrapper (``models.py:393-414``): ckpt dir with ``args.yml`` +
    generator weights (converted npz), weight norm folded for serving."""

    def __init__(self, ckpt_vocoder: Optional[str] = None, device=None,
                 dtype=jnp.float32, **config_overrides):
        cfg = {}
        if ckpt_vocoder and os.path.exists(os.path.join(ckpt_vocoder, "args.yml")):
            import yaml

            with open(os.path.join(ckpt_vocoder, "args.yml")) as f:
                cfg = yaml.safe_load(f) or {}
        cfg.update(config_overrides)
        kw = {k: cfg[k] for k in
              ("num_mels", "upsample_initial_channel", "upsample_rates",
               "upsample_kernel_sizes", "resblock", "resblock_kernel_sizes",
               "resblock_dilation_sizes", "activation", "snake_logscale")
              if k in cfg}
        self.generator = BigVGANGenerator(use_weight_norm=False, dtype=dtype, **kw)
        self.params = None
        if ckpt_vocoder:
            from versband_tpu.utils.checkpoint import load_npz_params

            for name in ("best_netG.npz", "generator.npz"):
                path = os.path.join(ckpt_vocoder, name)
                if os.path.exists(path):
                    self.params = fold_weight_norm(load_npz_params(path))
                    break
        self._apply = jax.jit(lambda p, mel: self.generator.apply(p, mel))

    def ensure_params(self, mel_shape=(1, 80, 16)):
        if self.params is None:
            self.params = fold_weight_norm(self.generator.init(
                jax.random.PRNGKey(0), jnp.zeros(mel_shape)))
        return self.params

    def vocode(self, spec) -> np.ndarray:
        spec = jnp.asarray(spec)
        if spec.ndim == 2:
            spec = spec[None]
        wav = self._apply(self.ensure_params(spec.shape), spec)
        return np.asarray(wav).squeeze()

    def __call__(self, spec) -> np.ndarray:
        return self.vocode(spec)
