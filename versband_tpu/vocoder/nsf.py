"""HiFi-GAN NSF — f0-driven neural source-filter vocoder variant.

Re-design of ``vocoder/hifigan/modules/hifigan_nsf.py`` (SineGen-based
harmonic source + per-scale noise_convs injected into the HiFi-GAN upsampling
stack, :104-182) and the runtime wrapper ``vocoder/hifigan/hifigan_nsf.py``
(ckpt-dir loading, mel->f0 estimation helper, STFT magnitude denoise, :13-95).

NSF source model: for each frame f0, harmonics k = 1..H+1 are synthesized as
phase-continuous sines (cumsum of instantaneous frequency), gated by the
voiced mask, mixed to a single excitation by a tanh-ed linear layer; unvoiced
regions get white noise.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.vocoder.conv import LRELU_SLOPE, WNConv1d, WNConvTranspose1d
from versband_tpu.vocoder.hifigan import ResBlock1, ResBlock2


def sine_gen(f0: jnp.ndarray, key: jax.Array, sampling_rate: int,
             harmonic_num: int = 8, sine_amp: float = 0.1,
             noise_std: float = 0.003, voiced_threshold: float = 0.0
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f0 [B, T, 1] at sample rate -> (sines [B, T, H+1], uv [B, T, 1])."""
    B, T, _ = f0.shape
    harmonics = jnp.arange(1, harmonic_num + 2, dtype=jnp.float32)
    rad = f0 * harmonics[None, None, :] / sampling_rate  # cycles per sample
    k_phase, k_noise = jax.random.split(key)
    init_phase = jax.random.uniform(k_phase, (B, 1, harmonic_num + 1))
    init_phase = init_phase.at[:, :, 0].set(0.0)  # fundamental starts at 0
    phase = 2 * jnp.pi * ((jnp.cumsum(rad, axis=1) + init_phase) % 1.0)
    sines = jnp.sin(phase)
    uv = (f0 > voiced_threshold).astype(jnp.float32)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sines.shape)
    return sine_amp * sines * uv + noise, uv


class SourceModuleHnNSF(fnn.Module):
    """Harmonic-plus-noise source (``hifigan_nsf.py`` SourceModuleHnNSF):
    sines -> tanh(linear) merge; noise source; uv."""

    sampling_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003

    @fnn.compact
    def __call__(self, f0: jnp.ndarray, key: jax.Array):
        sines, uv = sine_gen(f0, key, self.sampling_rate, self.harmonic_num,
                             self.sine_amp, self.noise_std)
        har = jnp.tanh(fnn.Dense(1, name="l_linear")(sines))  # [B, T, 1]
        k2 = jax.random.fold_in(key, 1)
        noise = jax.random.normal(k2, uv.shape) * self.sine_amp / 3.0
        return har, noise, uv


class NSFHifiGanGenerator(fnn.Module):
    """(mel [B, 80, T], f0 [B, T]) -> wav [B, T*hop]
    (``modules/hifigan_nsf.py:104-173``)."""

    in_channels: int = 80
    audio_sample_rate: int = 24000
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 4, 4)
    upsample_kernel_sizes: Sequence[int] = (9, 8, 8, 8)
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    harmonic_num: int = 8
    source_noise_std: float = 0.003
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, mel: jnp.ndarray, f0: Optional[jnp.ndarray] = None,
                 noise_key: Optional[jax.Array] = None) -> jnp.ndarray:
        total_up = int(np.prod(self.upsample_rates))
        har_source = None
        if f0 is not None:
            if noise_key is None:
                noise_key = self.make_rng("source")
            f0_up = jnp.repeat(f0[:, :, None], total_up, axis=1)  # nearest
            har_source, _, _ = SourceModuleHnNSF(
                self.audio_sample_rate, self.harmonic_num,
                noise_std=self.source_noise_std,
                name="m_source")(f0_up, noise_key)

        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)
        x = WNConv1d(self.upsample_initial_channel, 7,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="conv_pre")(x)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        n_up = len(self.upsample_rates)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = fnn.leaky_relu(x, LRELU_SLOPE)
            x = WNConvTranspose1d(ch, k, u,
                                  use_weight_norm=self.use_weight_norm,
                                  dtype=self.dtype, name=f"ups_{i}")(x)
            if har_source is not None:
                if i + 1 < n_up:
                    stride_f0 = int(np.prod(self.upsample_rates[i + 1:]))
                    src = WNConv1d(ch, stride_f0 * 2, stride=stride_f0,
                                   padding=stride_f0 // 2,
                                   use_weight_norm=False, dtype=self.dtype,
                                   name=f"noise_convs_{i}")(har_source)
                else:
                    src = WNConv1d(ch, 1, use_weight_norm=False,
                                   dtype=self.dtype,
                                   name=f"noise_convs_{i}")(har_source)
                x = x + src[:, : x.shape[1]]
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                h = res_cls(ch, rk, tuple(rd),
                            use_weight_norm=self.use_weight_norm,
                            dtype=self.dtype, name=f"resblocks_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = fnn.leaky_relu(x, 0.01)
        x = WNConv1d(1, 7, use_weight_norm=self.use_weight_norm, init_std=0.01,
                     dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def stft_denoise(wav: np.ndarray, v: float = 0.1, n_fft: int = 1024,
                 hop: int = 256) -> np.ndarray:
    """Spectral-magnitude floor denoise (``hifigan_nsf.py:13-21``)."""
    from scipy.signal import stft as sp_stft, istft as sp_istft

    _, _, spec = sp_stft(wav, nperseg=n_fft, noverlap=n_fft - hop,
                         padded=True)
    mag = np.clip(np.abs(spec) - v / n_fft, 0.0, None)
    _, out = sp_istft(mag * np.exp(1j * np.angle(spec)), nperseg=n_fft,
                      noverlap=n_fft - hop)
    return out[: len(wav)].astype(np.float32)


def estimate_f0_from_mel(mel: np.ndarray, sr: int = 24000, n_fft: int = 1280,
                         fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    """Coarse f0 from a log-mel: pseudo-invert the mel filterbank and pick the
    dominant low-frequency spectral peak per frame (``hifigan_nsf.py:60-88``'s
    piptrack approach, librosa-free)."""
    from versband_tpu.dsp.mel import mel_filterbank

    fb = mel_filterbank(sr, n_fft, mel.shape[0], fmin, fmax)  # [M, F]
    lin = np.linalg.pinv(fb) @ (10.0 ** mel)  # [F, T]
    lin = np.clip(lin, 0.0, None)
    freqs = np.linspace(0, sr / 2, lin.shape[0])
    lo, hi = 60.0, 1000.0
    band = (freqs >= lo) & (freqs <= hi)
    idx = np.argmax(lin[band], axis=0)
    f0 = freqs[band][idx]
    energy = lin[band].max(axis=0)
    f0[energy < energy.max() * 1e-3] = 0.0
    return f0.astype(np.float32)


class HifiGAN_NSF:
    """Runtime wrapper (``hifigan_nsf.py:44-95``): ckpt dir with config +
    step-globbed weights; ``spec2wav(mel, f0=None)`` with mel-derived f0
    fallback and optional output denoise."""

    def __init__(self, vocoder_ckpt: Optional[str] = None, device=None,
                 use_nsf: bool = True, **config_overrides):
        from versband_tpu.utils.config import load_config
        from versband_tpu.vocoder.conv import fold_weight_norm

        self.use_nsf = use_nsf
        cfg = {}
        if vocoder_ckpt and os.path.exists(f"{vocoder_ckpt}/config.yaml"):
            cfg = dict(load_config(f"{vocoder_ckpt}/config.yaml"))
        cfg.update(config_overrides)
        kw = {k: cfg[k] for k in
              ("audio_sample_rate", "upsample_initial_channel",
               "upsample_rates", "upsample_kernel_sizes", "resblock",
               "resblock_kernel_sizes", "resblock_dilation_sizes")
              if k in cfg}
        self.model = NSFHifiGanGenerator(use_weight_norm=False, **kw)
        self.sr = kw.get("audio_sample_rate", 24000)
        self.params = None
        if vocoder_ckpt:
            ckpts = sorted(
                glob.glob(f"{vocoder_ckpt}/model_ckpt_steps_*.npz"),
                key=lambda p: int(re.findall(r"steps_(\d+)", p)[0]))
            if ckpts:
                from versband_tpu.utils.checkpoint import load_npz_params

                self.params = fold_weight_norm(load_npz_params(ckpts[-1]))
        self._apply = jax.jit(
            lambda p, mel, f0, key: self.model.apply(p, mel, f0,
                                                     noise_key=key))
        # f0-less path (use_nsf=False): the reference calls the plain
        # generator with no source module (``hifigan_nsf.py:104``)
        self._apply_plain = jax.jit(lambda p, mel: self.model.apply(p, mel))

    def ensure_params(self, mel_shape, f0_shape=None):
        if self.params is None:
            from versband_tpu.vocoder.conv import fold_weight_norm

            f0 = None if f0_shape is None else jnp.zeros(f0_shape)
            self.params = fold_weight_norm(self.model.init(
                {"params": jax.random.PRNGKey(0),
                 "source": jax.random.PRNGKey(1)},
                jnp.zeros(mel_shape), f0,
                noise_key=jax.random.PRNGKey(2)))
        return self.params

    def spec2wav(self, mel, f0=None, denoise_v: float = 0.0) -> np.ndarray:
        mel = np.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        if f0 is None and self.use_nsf:
            f0 = np.stack([estimate_f0_from_mel(m, self.sr) for m in mel])
        if f0 is None:  # use_nsf=False: harmonic source skipped entirely
            params = self.ensure_params(mel.shape)
            wav = np.asarray(
                self._apply_plain(params, jnp.asarray(mel))).reshape(-1)
            if denoise_v > 0:
                wav = stft_denoise(wav, denoise_v)
            return wav
        f0 = np.asarray(f0, np.float32)
        if f0.ndim == 1:
            f0 = f0[None]
        params = self.ensure_params(mel.shape, f0.shape)
        wav = np.asarray(self._apply(params, jnp.asarray(mel),
                                     jnp.asarray(f0),
                                     jax.random.PRNGKey(0))).reshape(-1)
        if denoise_v > 0:
            wav = stft_denoise(wav, denoise_v)
        return wav

    def __call__(self, mel):
        return self.spec2wav(mel)
