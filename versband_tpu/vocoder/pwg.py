"""ParallelWaveGAN + MelGAN + PQMF, TPU-native.

Re-design of ``vocoder/parallel_wavegan/``:
  * WaveNet-style ``ParallelWaveGANGenerator`` — 30 gated residual layers over
    the noise signal with mel conditioning (``models/parallel_wavegan.py:21-205``,
    ``layers/residual_block.py:39-130``);
  * mel upsampling ``ConvInUpsampleNetwork`` (nearest-stretch + channel-free
    2-D smoothing convs, ``layers/upsample.py:16-175``);
  * ``MelGANGenerator`` / discriminators (``models/melgan.py:18-399``);
  * ``PQMF`` near-perfect-reconstruction filterbank for multiband synthesis
    (``layers/pqmf.py:15-129``).

All internal tensors are channel-last [B, T, C]; public APIs take/return the
reference's [B, C, T]. Filter banks are host-precomputed numpy constants.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.vocoder.conv import WNConv1d, WNConvTranspose1d

Array = jax.Array


class ResidualBlock(fnn.Module):
    """Gated WaveNet residual block (``layers/residual_block.py:39-130``):
    dilated conv -> split -> (+aux 1x1) -> tanh*sigmoid -> skip/residual 1x1."""

    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, c: Optional[Array],
                 skip: Optional[Array] = None, t_real: Optional[int] = None):
        """Returns ``(x', s)``. When ``skip`` (an fp32 [B, T, S] accumulator)
        is given, the whole layer runs as one fused Pallas pass
        (ops/fused_wavenet.py) and ``s`` is ``skip + new_skip``; otherwise the
        reference dense path runs and ``s`` is this layer's skip alone."""
        conv = WNConv1d(self.gate_channels, self.kernel_size,
                        dilation=self.dilation, use_bias=self.use_bias,
                        use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="conv")
        aux = WNConv1d(self.gate_channels, 1, use_bias=False,
                       use_weight_norm=self.use_weight_norm,
                       dtype=self.dtype, name="conv1x1_aux")
        skipc = WNConv1d(self.skip_channels, 1, use_bias=self.use_bias,
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="conv1x1_skip")
        outc = WNConv1d(self.residual_channels, 1, use_bias=self.use_bias,
                        use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="conv1x1_out")

        if skip is not None and c is not None and self.kernel_size == 3:
            from versband_tpu.ops.fused_wavenet import fused_wavenet_layer

            zch = self.gate_channels // 2
            zdummy = jnp.zeros((1, 1, zch), x.dtype)
            wg, bg = conv(x, fold_only=True)
            wc, _ = aux(c, fold_only=True)
            ws, bs = skipc(zdummy, fold_only=True)
            wo, bo = outc(zdummy, fold_only=True)
            fused = fused_wavenet_layer(
                x, c, skip,
                wg.astype(self.dtype), bg, wc[0].astype(self.dtype),
                ws[0].astype(self.dtype), bs, wo[0].astype(self.dtype), bo,
                self.dilation,
                x.shape[1] if t_real is None else t_real)
            if fused is not None:
                return fused
            # shapes outside the kernel's envelope: dense path below reuses
            # the exact same child modules/params and accumulates manually

        residual = x
        h = conv(x)
        xa, xb = jnp.split(h, 2, axis=-1)
        if c is not None:
            ch = aux(c)
            ca, cb = jnp.split(ch, 2, axis=-1)
            xa, xb = xa + ca, xb + cb
        z = jnp.tanh(xa) * fnn.sigmoid(xb)
        s = skipc(z)
        out = (outc(z) + residual) * math.sqrt(0.5)
        return (out, skip + s.astype(skip.dtype)) if skip is not None \
            else (out, s)


class UpsampleNetwork(fnn.Module):
    """Nearest-stretch + (1, 2s+1) smoothing convs per scale
    (``layers/upsample.py:61-123``). Input/output [B, T, C]."""

    upsample_scales: Sequence[int]
    freq_axis_kernel_size: int = 1
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, c: Array) -> Array:
        # channel-free 2-D conv == depthwise-in-C 1-D conv along T with a
        # learned (freq_k x time_k) stencil shared across mel bins.
        h = c
        for i, scale in enumerate(self.upsample_scales):
            fk = self.freq_axis_kernel_size
            # reference Conv2d init: fill 1/prod(kernel) (upsample.py:47-58)
            kernel = self.param(f"conv_{i}", fnn.initializers.constant(
                1.0 / ((scale * 2 + 1) * fk)), (scale * 2 + 1, fk, 1, 1),
                jnp.float32)
            if fk == 1:
                # Polyphase fast path (exactly equal to repeat+SAME-conv,
                # incl. the zero-pad boundary: the stretched-domain pad of
                # `scale` covers exactly one input frame). The reference's
                # nearest-stretch + (2s+1)-tap conv collapses per output
                # phase p to a 3-tap FIR on the UN-stretched signal:
                #   y[s*t+p] = A_p x[t-1] + B_p x[t] + C_p x[t+1]
                # with phase-folded weights from the kernel's prefix sums.
                # This keeps C=80 in the lane dim instead of materializing a
                # [B, s*T, C] image and convolving a 1-channel NHWC tensor
                # (VPU-bound; measured 65 -> ~4 ms at T=480k).
                w = kernel[:, 0, 0, 0]                       # [2s+1] fp32
                cs = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                      jnp.cumsum(w)])        # [2s+2]
                p = jnp.arange(scale)
                # W3[p] = (A_p, B_p, C_p): the 3 folded taps of phase p
                W3 = jnp.stack([
                    cs[scale - p],                           # sum w[0 : s-p]
                    cs[2 * scale - p] - cs[scale - p],
                    cs[2 * scale + 1] - cs[2 * scale - p]], axis=1)  # [s, 3]
                # one standard k=3 conv emitting all phases as s*C channels
                # (depth-to-space): W_d[j, c, p*C + c'] = W3[p, j] * d(c, c').
                # The row-major [T, s, C] -> [T*s, C] reshape interleaves
                # phases exactly. Structural zeros cost C x FLOPs but keep
                # the op a plain MXU conv (the broadcast-FMA formulation of
                # the same math blew up XLA compile time at T=480k).
                ch = h.shape[-1]
                eye = jnp.eye(ch, dtype=jnp.float32)
                Wd = jnp.einsum("pj,ce->jcpe", W3, eye).reshape(
                    3, ch, scale * ch)
                y = jax.lax.conv_general_dilated(
                    h.astype(self.dtype), Wd.astype(self.dtype),
                    window_strides=(1,), padding=[(1, 1)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32)
                bsz, t = h.shape[0], h.shape[1]
                h = y.reshape(bsz, t * scale, ch).astype(self.dtype)
            else:
                g = h[..., None]  # [B, T, C, 1]: treat (T, C) as spatial
                g = jnp.repeat(g, scale, axis=1)  # nearest stretch along T
                g = jax.lax.conv_general_dilated(
                    g.astype(self.dtype), kernel.astype(self.dtype),
                    window_strides=(1, 1),
                    padding=[(scale, scale),
                             ((fk - 1) // 2, (fk - 1) // 2)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(self.dtype)
                h = g[..., 0]
        return h


class ConvInUpsampleNetwork(fnn.Module):
    """Context conv (kernel 2w+1, VALID) + UpsampleNetwork
    (``layers/upsample.py:125-175``). Input [B, T' + 2w, C] -> [B, T, C]."""

    upsample_scales: Sequence[int]
    aux_channels: int = 80
    aux_context_window: int = 2
    freq_axis_kernel_size: int = 1
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, c: Array) -> Array:
        k = 2 * self.aux_context_window + 1
        c = WNConv1d(self.aux_channels, k, padding=0, use_bias=False,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_in")(c)
        return UpsampleNetwork(self.upsample_scales,
                               self.freq_axis_kernel_size,
                               self.use_weight_norm, self.dtype,
                               name="upsample")(c)


class ParallelWaveGANGenerator(fnn.Module):
    """(noise [B, 1, T], mel [B, 80, T']) -> wav [B, 1, T]
    (``models/parallel_wavegan.py:21-205``)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Sequence[int] = (4, 4, 4, 5)  # prod = 320 = hop
    use_upsample: bool = True
    use_pitch_embed: bool = False
    use_weight_norm: bool = True
    fused_inference: bool = False  # fused Pallas residual layers (no grads)
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, c: Optional[Array] = None,
                 pitch: Optional[Array] = None) -> Array:
        x = jnp.swapaxes(x, 1, 2).astype(self.dtype)  # [B, T, 1]
        if c is not None:
            c = jnp.swapaxes(c, 1, 2).astype(self.dtype)  # [B, T', 80]
            if self.use_pitch_embed and pitch is not None:
                p = fnn.Embed(300, self.aux_channels, name="pitch_embed")(pitch)
                c = fnn.Dense(self.aux_channels, dtype=self.dtype,
                              name="c_proj")(jnp.concatenate([c, p], -1))
            if self.use_upsample:
                # aux window context is consumed by the VALID conv_in
                c = ConvInUpsampleNetwork(
                    self.upsample_scales, self.aux_channels,
                    self.aux_context_window,
                    use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                    name="upsample_net")(c)
            assert c.shape[1] == x.shape[1], (c.shape, x.shape)

        h = WNConv1d(self.residual_channels, 1,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="first_conv")(x)
        layers_per_stack = self.layers // self.stacks
        # fused serving path: zero-pad T to the kernel's block grid, thread an
        # fp32 skip accumulator through the fused layers, slice back. A 1x1
        # first_conv and zero padding commute, so padding here is exact.
        fused = (self.fused_inference and c is not None
                 and self.kernel_size == 3
                 and 2 ** (layers_per_stack - 1) <= 512)
        t_real = h.shape[1]
        if fused:
            from versband_tpu.ops.fused_wavenet import BLOCK_T, D_HALO

            blk = BLOCK_T
            t_pad = max(-(-t_real // blk) * blk, 2 * D_HALO)
            h = jnp.pad(h, ((0, 0), (0, t_pad - t_real), (0, 0)))
            c = jnp.pad(c, ((0, 0), (0, t_pad - t_real), (0, 0)))
            skips = jnp.zeros(h.shape[:2] + (self.skip_channels,),
                              jnp.float32)
        else:
            skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            blk_mod = ResidualBlock(
                self.kernel_size, self.residual_channels, self.gate_channels,
                self.skip_channels, self.aux_channels, dilation,
                use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                name=f"conv_layers_{layer}")
            if fused:
                h, skips = blk_mod(h, c, skip=skips, t_real=t_real)
            else:
                h, s = blk_mod(h, c)
                skips = skips + s
        if fused:
            skips = skips[:, :t_real].astype(self.dtype)
        skips = skips * math.sqrt(1.0 / self.layers)

        z = fnn.relu(skips)
        z = WNConv1d(self.skip_channels, 1,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="last_conv_0")(z)
        z = fnn.relu(z)
        z = WNConv1d(self.out_channels, 1,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="last_conv_1")(z)
        return jnp.swapaxes(z, 1, 2)

    @staticmethod
    def receptive_field_size(layers=30, stacks=3, kernel_size=3) -> int:
        lpc = layers // stacks
        return (kernel_size - 1) * sum(2 ** (i % lpc) for i in range(layers)) + 1


class ParallelWaveGAN:
    """Runtime wrapper serving ``vocode(mel)``, mirroring the ``HifiGAN`` /
    ``VocoderBigVGAN`` wrapper interface so the inference CLI can swap
    vocoder families. Serving convention follows the upstream
    parallel_wavegan library: the mel is edge-padded by ``aux_context_window``
    frames per side (consumed by the VALID conv_in), so the waveform covers
    all T' frames (T' x hop samples); the WaveNet input is standard-normal
    noise. Weights: a converted ``.npz`` dir ('pwg' family of
    ``utils/torch_convert``) or absent (random init, smoke use). Uses the
    fused Pallas residual layers by default (exact, inference-only).
    """

    def __init__(self, vocoder_ckpt: Optional[str] = None, device=None,
                 dtype=jnp.float32, fused_inference: bool = True, seed: int = 0,
                 **overrides):
        from versband_tpu.vocoder.conv import fold_weight_norm

        self._fold = fold_weight_norm
        self.model = ParallelWaveGANGenerator(
            use_weight_norm=False, dtype=dtype,
            fused_inference=fused_inference, **overrides)
        self.hop = int(np.prod(self.model.upsample_scales))
        self.params = None
        if vocoder_ckpt:
            import os

            from versband_tpu.utils.checkpoint import load_npz_params

            for name in ("model_gen.npz", "generator.npz"):
                path = os.path.join(vocoder_ckpt, name)
                if os.path.exists(path):
                    self.params = fold_weight_norm(load_npz_params(path))
                    break
        self._key = jax.random.PRNGKey(seed)
        self._apply = jax.jit(lambda p, x, c: self.model.apply(p, x, c))

    def ensure_params(self, x_shape, c_shape):
        if self.params is None:
            self.params = self._fold(self.model.init(
                jax.random.PRNGKey(0), jnp.zeros(x_shape), jnp.zeros(c_shape)))
        return self.params

    def spec2wav(self, mel, **kwargs) -> np.ndarray:
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.shape[1] != self.model.aux_channels:
            mel = jnp.swapaxes(mel, 1, 2)
        w = self.model.aux_context_window
        mel = jnp.pad(mel, ((0, 0), (0, 0), (w, w)), mode="edge")
        t_wav = (mel.shape[-1] - 2 * w) * self.hop
        self._key, k = jax.random.split(self._key)
        noise = jax.random.normal(k, (mel.shape[0], 1, t_wav),
                                  self.model.dtype)
        wav = self._apply(self.ensure_params(noise.shape, mel.shape),
                          noise, mel)
        return np.asarray(wav, np.float32).reshape(-1)

    def vocode(self, mel) -> np.ndarray:
        assert np.ndim(mel) == 2
        return self.spec2wav(mel)

    def __call__(self, mel) -> np.ndarray:
        return self.spec2wav(mel)


class ParallelWaveGANDiscriminator(fnn.Module):
    """Dilated non-causal conv stack discriminator
    (``models/parallel_wavegan.py:207-300``). wav [B, 1, T] -> [B, 1, T]."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    negative_slope: float = 0.2
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)
        for i in range(self.layers - 1):
            dilation = i if self.dilation_factor == 1 else self.dilation_factor ** i
            dilation = max(dilation, 1)
            h = WNConv1d(self.conv_channels, self.kernel_size,
                         dilation=dilation,
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name=f"conv_{i}")(h)
            h = fnn.leaky_relu(h, self.negative_slope)
        h = WNConv1d(self.out_channels, self.kernel_size,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_out")(h)
        return jnp.swapaxes(h, 1, 2)


class ResidualStack(fnn.Module):
    """MelGAN residual stack (``models/melgan.py`` via ``layers/residual_stack.py``):
    lrelu -> dilated conv -> lrelu -> 1x1, residual 1x1 shortcut."""

    kernel_size: int = 3
    channels: int = 32
    dilation: int = 1
    negative_slope: float = 0.2
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = fnn.leaky_relu(x, self.negative_slope)
        # reference pads with ReflectionPad1d before the VALID dilated conv
        # (residual_stack.py:46-52)
        pad = (self.kernel_size - 1) // 2 * self.dilation
        h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        h = WNConv1d(self.channels, self.kernel_size, dilation=self.dilation,
                     padding=0, use_weight_norm=self.use_weight_norm,
                     dtype=self.dtype, name="conv_dilated")(h)
        h = fnn.leaky_relu(h, self.negative_slope)
        h = WNConv1d(self.channels, 1, use_weight_norm=self.use_weight_norm,
                     dtype=self.dtype, name="conv_1x1")(h)
        sc = WNConv1d(self.channels, 1, use_weight_norm=self.use_weight_norm,
                      dtype=self.dtype, name="shortcut")(x)
        return h + sc


class MelGANGenerator(fnn.Module):
    """mel [B, 80, T'] -> wav [B, out, T' * prod(scales)]
    (``models/melgan.py:18-192``)."""

    in_channels: int = 80
    out_channels: int = 1
    kernel_size: int = 7
    channels: int = 512
    upsample_scales: Sequence[int] = (8, 8, 5)  # prod 320
    stack_kernel_size: int = 3
    stacks: int = 3
    negative_slope: float = 0.2
    use_final_nonlinear_activation: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, c: Array) -> Array:
        h = jnp.swapaxes(c, 1, 2).astype(self.dtype)
        # reference: ReflectionPad1d((k-1)//2) + VALID conv (melgan.py:66-69)
        pad = (self.kernel_size - 1) // 2
        h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        h = WNConv1d(self.channels, self.kernel_size, padding=0,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_in")(h)
        for i, scale in enumerate(self.upsample_scales):
            ch = self.channels // (2 ** (i + 1))
            h = fnn.leaky_relu(h, self.negative_slope)
            h = WNConvTranspose1d(
                ch, scale * 2, scale,
                padding=scale // 2 + scale % 2, output_padding=scale % 2,
                use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                name=f"ups_{i}")(h)
            for j in range(self.stacks):
                h = ResidualStack(
                    self.stack_kernel_size, ch, self.stack_kernel_size ** j,
                    self.negative_slope, self.use_weight_norm, self.dtype,
                    name=f"stack_{i}_{j}")(h)
        h = fnn.leaky_relu(h, self.negative_slope)
        h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        h = WNConv1d(self.out_channels, self.kernel_size, padding=0,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_out")(h)
        if self.use_final_nonlinear_activation:
            h = jnp.tanh(h)
        return jnp.swapaxes(h, 1, 2)


class MelGANDiscriminator(fnn.Module):
    """Single-scale MelGAN discriminator (``models/melgan.py:194-300``):
    returns the list of feature maps, last one being the score."""

    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    negative_slope: float = 0.2
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array):
        outs = []
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)
        k0 = int(np.prod(self.kernel_sizes))
        h = WNConv1d(self.channels, k0, use_weight_norm=self.use_weight_norm,
                     dtype=self.dtype, name="conv_in")(h)
        h = fnn.leaky_relu(h, self.negative_slope)
        outs.append(h)
        ch = self.channels
        for i, scale in enumerate(self.downsample_scales):
            # reference groups = in_channels // 4 (``melgan.py:257``) — NOT a
            # function of the clamped out_channels, which diverges once
            # channels saturate at max_downsample_channels
            groups = max(ch // 4, 1)
            ch = min(ch * scale, self.max_downsample_channels)
            h = WNConv1d(ch, scale * 10 + 1, stride=scale, groups=groups,
                         padding=scale * 5,
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name=f"down_{i}")(h)
            h = fnn.leaky_relu(h, self.negative_slope)
            outs.append(h)
        h = WNConv1d(min(ch * 2, self.max_downsample_channels),
                     self.kernel_sizes[0],
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_mid")(h)
        h = fnn.leaky_relu(h, self.negative_slope)
        outs.append(h)
        h = WNConv1d(self.out_channels, self.kernel_sizes[1],
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_out")(h)
        outs.append(h)
        return outs


class MelGANMultiScaleDiscriminator(fnn.Module):
    """3-scale discriminator with avg-pool downsampling between scales
    (``models/melgan.py:303-399``)."""

    scales: int = 3
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array):
        outs = []
        h = x
        for i in range(self.scales):
            outs.append(MelGANDiscriminator(
                use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                name=f"disc_{i}")(h))
            hw = jnp.swapaxes(h, 1, 2)
            hw = fnn.avg_pool(hw, (4,), strides=(2,), padding=((1, 1),))
            h = jnp.swapaxes(hw, 1, 2)
        return outs


# ---------------------------------------------------------------------------
# PQMF
# ---------------------------------------------------------------------------

def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-window prototype lowpass (``layers/pqmf.py:16-49``)."""
    assert taps % 2 == 0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio
    return h_i * np.kaiser(taps + 1, beta)


class PQMF:
    """Near-perfect-reconstruction pseudo-QMF bank (``layers/pqmf.py:51-129``).

    Pure function-of-constants (no params): filters are numpy; analysis =
    cos-modulated filterbank conv + stride-M decimation fused into ONE strided
    conv (the reference's separate updown_filter conv is algebraically the
    same); synthesis = zero-stuff upsample + synthesis filters.
    """

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.15, beta: float = 9.0):
        h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
        n = np.arange(taps + 1)
        h_analysis = np.zeros((subbands, taps + 1))
        h_synthesis = np.zeros((subbands, taps + 1))
        for k in range(subbands):
            phase = (2 * k + 1) * (np.pi / (2 * subbands)) * (n - (taps - 1) / 2)
            h_analysis[k] = 2 * h_proto * np.cos(phase + (-1) ** k * np.pi / 4)
            h_synthesis[k] = 2 * h_proto * np.cos(phase - (-1) ** k * np.pi / 4)
        # flax conv layout [k, C_in, C_out]
        self.analysis_filter = jnp.asarray(
            h_analysis.T[:, None, :], jnp.float32)      # [taps+1, 1, M]
        self.synthesis_filter = jnp.asarray(
            h_synthesis.T[:, :, None], jnp.float32)     # [taps+1, M, 1]
        self.subbands = subbands
        self.taps = taps

    def analysis(self, x: Array) -> Array:
        """[B, 1, T] -> [B, M, T//M]: filter + decimate in one strided conv."""
        M = self.subbands
        xt = jnp.swapaxes(x, 1, 2)
        xt = jnp.pad(xt, ((0, 0), (self.taps // 2, self.taps // 2), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xt, self.analysis_filter, window_strides=(M,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return jnp.swapaxes(y, 1, 2)

    def synthesis(self, x: Array) -> Array:
        """[B, M, T//M] -> [B, 1, T]: zero-stuff x M (gain M) + synthesis filters."""
        M = self.subbands
        xt = jnp.swapaxes(x, 1, 2)  # [B, T//M, M]
        B, Tm, _ = xt.shape
        up = jnp.zeros((B, Tm * M, M), xt.dtype).at[:, ::M].set(xt * M)
        up = jnp.pad(up, ((0, 0), (self.taps // 2, self.taps // 2), (0, 0)))
        y = jax.lax.conv_general_dilated(
            up, self.synthesis_filter, window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return jnp.swapaxes(y, 1, 2)
