"""HiFi-GAN vocoder family, TPU-native.

Re-design of ``vocoder/hifigan/modules/hifigan.py`` (generator :101-152,
ResBlock1 :27-65, ResBlock2 :68-91, CodeUpsample :155-195) and the runtime
wrapper ``vocoder/hifigan/hifigan.py:6-42``:

  * channel-last ``[B, T, C]`` conv layout throughout (XLA-native);
  * transposed-conv upsampling via the polyphase dense-conv formulation
    (see versband_tpu.vocoder.conv) — full MXU utilization at stride 4/5;
  * weight norm as a param split, foldable for inference;
  * the multi-kernel ResBlock fan-out is evaluated as parallel branches that
    XLA fuses; outputs are averaged as in the reference forward.

Default hyperparameters target the 24 kHz / hop-320 checkpoints used by the
shipped configs (``configs/ae_accomp.yaml:51-53``): upsample rates
(5, 4, 4, 4) with kernels (9, 8, 8, 8) — product 320 = hop size.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.vocoder.conv import (
    LRELU_SLOPE, WNConv1d, WNConvTranspose1d, fold_weight_norm)

Array = jax.Array


class ResBlock1(fnn.Module):
    """Two-conv residual units at dilations (1,3,5) (``hifigan.py:27-65``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dilations):
            h = fnn.leaky_relu(x, LRELU_SLOPE)
            h = WNConv1d(self.channels, self.kernel_size, dilation=d,
                         use_weight_norm=self.use_weight_norm, init_std=0.01,
                         dtype=self.dtype, name=f"convs1_{i}")(h)
            h = fnn.leaky_relu(h, LRELU_SLOPE)
            h = WNConv1d(self.channels, self.kernel_size, dilation=1,
                         use_weight_norm=self.use_weight_norm, init_std=0.01,
                         dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class ResBlock2(fnn.Module):
    """Single-conv residual units at dilations (1,3) (``hifigan.py:68-91``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dilations):
            h = fnn.leaky_relu(x, LRELU_SLOPE)
            h = WNConv1d(self.channels, self.kernel_size, dilation=d,
                         use_weight_norm=self.use_weight_norm, init_std=0.01,
                         dtype=self.dtype, name=f"convs_{i}")(h)
            x = x + h
        return x


class HifiGanGenerator(fnn.Module):
    """mel [B, 80, T] -> waveform [B, T*hop] (``hifigan.py:101-152``)."""

    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 4, 4)
    upsample_kernel_sizes: Sequence[int] = (9, 8, 8, 8)
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    c_out: int = 1
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, mel: Array) -> Array:
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)  # [B, T, 80]
        x = WNConv1d(self.upsample_initial_channel, 7,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_pre")(x)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = fnn.leaky_relu(x, LRELU_SLOPE)
            x = WNConvTranspose1d(ch, k, u,
                                  use_weight_norm=self.use_weight_norm,
                                  dtype=self.dtype, name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                h = res_cls(ch, rk, tuple(rd),
                            use_weight_norm=self.use_weight_norm,
                            dtype=self.dtype, name=f"resblocks_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = fnn.leaky_relu(x, 0.01)
        x = WNConv1d(self.c_out, 7, use_weight_norm=self.use_weight_norm,
                     init_std=0.01, dtype=self.dtype, name="conv_post")(x)
        x = jnp.tanh(x)
        return x[..., 0] if self.c_out == 1 else jnp.swapaxes(x, 1, 2)


class CodeUpsampleHifiGanGenerator(fnn.Module):
    """Codec-token input variant (``hifigan.py:155-195``): per-codebook
    embeddings (offset ids, clamp to pad), channel-flattened, optionally
    linearly time-upsampled, then the standard HiFi-GAN stack."""

    code_num: int = 1024
    codebook_num: int = 3
    code_emb_dim: int = 128
    unit_upsample_rate: float = 1.0
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 4, 4)
    upsample_kernel_sizes: Sequence[int] = (9, 8, 8, 8)
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, codes: Array) -> Array:
        # codes: [B, Q, T] int token ids
        B, Q, T = codes.shape
        assert Q == self.codebook_num
        pad_id = self.code_num * self.codebook_num
        offsets = self.code_num * jnp.arange(Q, dtype=codes.dtype)
        ids = jnp.minimum(codes + offsets[None, :, None], pad_id)
        emb = fnn.Embed(pad_id + 5, self.code_emb_dim, dtype=self.dtype,
                        name="code_embed")(ids.astype(jnp.int32))  # [B,Q,T,e]
        x = jnp.swapaxes(emb, 1, 2).reshape(B, T, Q * self.code_emb_dim)
        if self.unit_upsample_rate != 1.0:
            tgt = int(T * self.unit_upsample_rate)
            x = jax.image.resize(x, (B, tgt, x.shape[-1]), "linear")
        gen = HifiGanGenerator(
            in_channels=x.shape[-1],
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            resblock=self.resblock,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            use_weight_norm=self.use_weight_norm, dtype=self.dtype,
            name="generator")
        # generator expects channel-first [B, C, T]
        return gen(jnp.swapaxes(x, 1, 2))


class HifiGAN:
    """Runtime wrapper (``vocoder/hifigan/hifigan.py:6-42``): loads a ckpt dir
    with ``config.yaml`` + generator weights, folds weight norm, serves
    ``vocode(mel)``. Weights may be a converted ``.npz`` (see
    versband_tpu.utils.torch_convert) or absent (random init, for smoke use).
    """

    def __init__(self, vocoder_ckpt: Optional[str] = None, device=None,
                 dtype=jnp.float32, **config_overrides):
        from versband_tpu.utils.config import load_config

        cfg = {}
        if vocoder_ckpt and os.path.exists(f"{vocoder_ckpt}/config.yaml"):
            cfg = dict(load_config(f"{vocoder_ckpt}/config.yaml"))
        cfg.update(config_overrides)
        kw = {}
        for src, dst in [("audio_num_mel_bins", "in_channels"),
                         ("upsample_initial_channel", "upsample_initial_channel"),
                         ("upsample_rates", "upsample_rates"),
                         ("upsample_kernel_sizes", "upsample_kernel_sizes"),
                         ("resblock", "resblock"),
                         ("resblock_kernel_sizes", "resblock_kernel_sizes"),
                         ("resblock_dilation_sizes", "resblock_dilation_sizes")]:
            if src in cfg:
                kw[dst] = cfg[src]
        # inference: weight norm folded into plain kernels
        self.model = HifiGanGenerator(use_weight_norm=False, dtype=dtype, **kw)
        self.params = None
        if vocoder_ckpt:
            self.params = self._load_params(vocoder_ckpt)
        self._apply = jax.jit(lambda p, mel: self.model.apply(p, mel))

    def _load_params(self, ckpt_dir: str):
        from versband_tpu.utils.checkpoint import load_npz_params

        for name in ("model_gen.npz", "generator.npz"):
            path = os.path.join(ckpt_dir, name)
            if os.path.exists(path):
                return fold_weight_norm(load_npz_params(path))
        return None

    def ensure_params(self, mel_shape=(1, 80, 16)):
        if self.params is None:
            self.params = fold_weight_norm(self.model.init(
                jax.random.PRNGKey(0), jnp.zeros(mel_shape)))
        return self.params

    def spec2wav(self, mel, **kwargs) -> np.ndarray:
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.shape[1] != self.model.in_channels:
            mel = jnp.swapaxes(mel, 1, 2)
        wav = self._apply(self.ensure_params(mel.shape), mel)
        return np.asarray(wav).reshape(-1)

    def vocode(self, mel) -> np.ndarray:
        assert np.ndim(mel) == 2
        return self.spec2wav(mel)

    def __call__(self, mel) -> np.ndarray:
        return self.spec2wav(mel)
