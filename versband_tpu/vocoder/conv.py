"""Conv primitives for the vocoder family, TPU-first.

All vocoder tensors are channel-last ``[B, T, C]`` internally (the native
XLA/TPU conv layout); public wrappers accept the reference's ``[B, 80, T]``
mels at the boundary.

Weight normalization (``w = g * v / ||v||``, used by every reference vocoder,
e.g. ``vocoder/hifigan/modules/hifigan.py:108-127``) is implemented as a
param split (v, g) for training; ``fold_weight_norm`` collapses it into a
plain kernel for inference — the reference calls ``remove_weight_norm`` before
serving too.

Transposed convs (the HiFi-GAN upsampling stack) are computed as **subpixel
(polyphase) regular convs**: gather the transposed kernel into per-phase taps,
run ONE dense conv producing ``C_out * stride`` channels, and depth-to-space
reshape. XLA's ``conv_transpose`` lowers to a zero-stuffed conv that wastes
(stride-1)/stride of the MXU work; the polyphase form does the same math at
full MXU utilization (SURVEY.md §7.3 hard part 5).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

Array = jax.Array

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """Torch-style SAME padding for odd kernels (``hifigan.py:23-24``)."""
    return (kernel_size * dilation - dilation) // 2


def _wn_kernel(module: fnn.Module, name: str, shape: Tuple[int, ...],
               use_weight_norm: bool, init_std: Optional[float]) -> Array:
    """Create a (possibly weight-normalized) conv kernel param.

    ``shape`` is flax layout ``(k, C_in, C_out)``; the norm is over all dims
    but the last. ``init_std`` mimics the reference's ``init_weights``
    normal(0, 0.01) on upsample/post convs (``hifigan.py:11-14``).
    """
    if init_std is not None:
        init = fnn.initializers.normal(init_std)
    else:
        init = fnn.initializers.lecun_normal()
    if not use_weight_norm:
        return module.param(name, init, shape, jnp.float32)
    v = module.param(f"{name}_v", init, shape, jnp.float32)
    g = module.param(f"{name}_g",
                     lambda key, s: jnp.linalg.norm(
                         v.reshape(-1, s[0]), axis=0),
                     (shape[-1],))
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)),
                            keepdims=True) + 1e-12)
    return v / norm * g


def _auto_time_block(cin: int, cout: int, T: int, k: int, stride: int,
                     groups: int) -> int:
    """Largest power-of-2 packing factor for the space-to-depth conv.

    Only real convolutions benefit: k=1 convs are already pure matmuls (the
    MXU path), and blocking them just multiplies FLOPs by r (measured 1.6x
    slower on the ParallelWaveGAN 1x1 stack).
    """
    if stride != 1 or groups != 1 or k < 3 or k % 2 == 0 or T <= 0:
        return 1
    r = 1
    while (2 * r * max(cin, cout) <= _BLOCK_TARGET_CH and T % (2 * r) == 0):
        r *= 2
    return r


# pack channels up to the MXU lane width
_BLOCK_TARGET_CH = 128


def space_to_depth_conv1d(x: Array, kernel: Array, dilation: int, pad: int,
                          r: int, dtype) -> Array:
    """Exact stride-1 SAME conv over ``[B, T, C]`` computed in a
    channel-packed ``[B, T/r, r*C]`` layout.

    Vocoder tails run convs at tiny channel counts (32-64) over huge T
    (~480k samples) — XLA lowers those to the VPU at ~4 TFLOP/s. Packing r
    consecutive samples into channels (a free contiguous reshape) and
    convolving with the equivalent block-sparse ``[kb, r*C, r*C]`` kernel
    puts the same math on the MXU: measured 3-5x faster at the HiFi-GAN
    stage-4 shape despite computing ~kb*r/k more (mostly-zero) FLOPs. Exact
    up to fp reassociation: every extra multiplier is a structural zero.
    """
    B, T, cin = x.shape
    k, _, cout = kernel.shape
    offs = [tap * dilation - pad for tap in range(k)]
    binmin = min((j + o) // r for j in range(r) for o in offs)
    binmax = max((j + o) // r for j in range(r) for o in offs)
    kb = binmax - binmin + 1
    Wb = jnp.zeros((kb, r * cin, r * cout), kernel.dtype)
    for j in range(r):
        for tap in range(k):
            src = j + offs[tap]
            bb = src // r - binmin
            jin = src % r
            Wb = Wb.at[bb, jin * cin:(jin + 1) * cin,
                       j * cout:(j + 1) * cout].add(kernel[tap])
    xb = x.reshape(B, T // r, r * cin)
    y = jax.lax.conv_general_dilated(
        xb.astype(dtype), Wb.astype(dtype), window_strides=(1,),
        padding=[(-binmin, binmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(dtype)
    return y.reshape(B, T, cout)


class WNConv1d(fnn.Module):
    """Weight-normalized 1-D conv over ``[B, T, C]``.

    ``time_block``: space-to-depth packing factor for the small-channel/huge-T
    regime (see ``space_to_depth_conv1d``). ``None`` (default) picks it
    automatically; ``1`` disables.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: Optional[int] = None  # None -> torch get_padding (odd-kernel SAME)
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = True
    init_std: Optional[float] = None
    time_block: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, *, fold_only: bool = False):
        """Apply the conv, or with ``fold_only`` return the folded
        ``(kernel [k, C_in, C_out], bias [C_out])`` without applying — for
        externally fused kernels (ops/fused_wavenet.py). Both modes declare
        the identical param set, so checkpoints are unaffected."""
        cin = x.shape[-1]
        kernel = _wn_kernel(self, "kernel",
                            (self.kernel_size, cin // self.groups, self.features),
                            self.use_weight_norm, self.init_std)
        if fold_only:
            if self.use_bias:
                bias = self.param("bias", fnn.initializers.zeros,
                                  (self.features,), jnp.float32)
            else:
                bias = jnp.zeros((self.features,), jnp.float32)
            return kernel, bias
        pad = self.padding if self.padding is not None else \
            get_padding(self.kernel_size, self.dilation)
        sym_same = pad == get_padding(self.kernel_size, self.dilation)
        r = self.time_block
        if r is None:
            r = _auto_time_block(cin, self.features, x.shape[1],
                                 self.kernel_size, self.stride, self.groups)
        if r > 1 and sym_same and x.shape[1] % r == 0:
            out = space_to_depth_conv1d(x, kernel, self.dilation, pad, r,
                                        self.dtype)
        else:
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(self.stride,),
                padding=[(pad, pad)],
                rhs_dilation=(self.dilation,),
                feature_group_count=self.groups,
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", fnn.initializers.zeros, (self.features,),
                           jnp.float32)
            out = out + b.astype(self.dtype)
        return out


def polyphase_conv_transpose(x: Array, kernel: Array, stride: int,
                             padding: int, output_padding: int = 0,
                             dtype=jnp.float32) -> Array:
    """Torch-equivalent ``ConvTranspose1d(stride, padding)`` as one dense conv.

    ``x``: [B, T, C_in]; ``kernel``: flax layout [k, C_in, C_out] holding the
    *transposed-conv* weights (torch ``[C_in, C_out, k]`` transposed to
    k-first). Output: [B, T*stride + (k - stride - 2*padding), C_out] — for the
    vocoder configs (k - stride even, padding=(k-stride)//2) exactly
    [B, T*stride, C_out].

    Identity: y[m*u + r] = sum_s x[m - s] * W[s*u + r + padding], where the
    tap index must lie in [0, k). Gathering W into per-(phase, s) taps turns
    the zero-stuffed transposed conv into a standard conv with
    ``C_out * stride`` outputs and a depth-to-space reshape.
    """
    k, cin, cout = kernel.shape
    u = stride
    # tap offsets s such that 0 <= s*u + r + padding < k for some phase r
    s_min = -((u - 1 + padding) // u)          # most-negative (future) tap
    s_max = (k - 1 - padding) // u             # most-positive (past) tap
    S = s_max - s_min + 1

    # Build gathered weights Wg[tap, C_in, phase, C_out] with zeros out of range.
    s_idx = np.arange(s_min, s_max + 1)[:, None]         # [S, 1]
    r_idx = np.arange(u)[None, :]                        # [1, u]
    j = s_idx * u + r_idx + padding                      # [S, u]
    valid = (j >= 0) & (j < k)
    j_clip = np.clip(j, 0, k - 1)
    Wg = kernel[j_clip.reshape(-1), :, :]                # [S*u, C_in, C_out]
    Wg = Wg.reshape(S, u, cin, cout) * jnp.asarray(
        valid, kernel.dtype)[:, :, None, None]
    # conv kernel: taps ordered most-positive-s first means x[m-s] ↔ standard
    # correlation over a left-padded sequence; flip s so kernel position 0 is
    # the oldest input.
    Wg = Wg[::-1]                                        # [S, u, C_in, C_out]
    Wg = jnp.moveaxis(Wg, 2, 1).reshape(S, cin, u * cout)  # [S, C_in, u*C_out]

    # torch output length: (T-1)*u - 2*padding + k + output_padding; when it
    # exceeds T*u the tail spills into phase frames beyond m = T-1 — extend.
    out_len = (x.shape[1] - 1) * u - 2 * padding + k + output_padding
    frames = -(-out_len // u)                            # ceil(out_len / u)
    extra_m = frames - x.shape[1]
    # pad x: s_max past frames on the left; future taps + tail frames on the right
    xp = jnp.pad(x, ((0, 0), (s_max, -s_min + max(extra_m, 0)), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), Wg.astype(dtype), window_strides=(1,),
        padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(dtype)  # [B, frames, u*C_out]
    B, T = y.shape[0], y.shape[1]
    y = y.reshape(B, T, u, cout).reshape(B, T * u, cout)
    return y[:, :out_len]


class WNConvTranspose1d(fnn.Module):
    """Weight-normalized transposed conv via the polyphase formulation."""

    features: int
    kernel_size: int
    stride: int
    padding: Optional[int] = None  # None -> (k - stride) // 2 (torch HiFi-GAN)
    output_padding: int = 0
    use_bias: bool = True
    use_weight_norm: bool = True
    init_std: Optional[float] = 0.01
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = _wn_kernel(self, "kernel",
                            (self.kernel_size, cin, self.features),
                            self.use_weight_norm, self.init_std)
        pad = self.padding if self.padding is not None else \
            (self.kernel_size - self.stride) // 2
        y = polyphase_conv_transpose(x, kernel, self.stride, pad,
                                     self.output_padding, self.dtype)
        if self.use_bias:
            b = self.param("bias", fnn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def fold_weight_norm(params):
    """Collapse every (kernel_v, kernel_g) pair into a plain kernel — for
    inference params (the analogue of ``remove_weight_norm``). The folded tree
    still loads into modules built with ``use_weight_norm=True``? No: build the
    module with ``use_weight_norm=False`` and feed it this folded tree."""
    def fold(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for key in list(d.keys()):
            if key.endswith("_v"):
                base = key[:-2]
                v, g = d[key], d[base + "_g"]
                norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)),
                                        keepdims=True) + 1e-12)
                out[base] = v / norm * g
            elif key.endswith("_g"):
                continue
            else:
                out[key] = fold(d[key])
        return out

    return jax.tree_util.tree_map(lambda x: x, fold(params))
