"""Mel-spectrogram front-end, TPU-native.

Functional equivalent of the reference's ``preprocess/NAT_mel.py:42-86`` (MelNet)
with the canonical audio constants from ``preprocess/mel_spec_24k.py:300-316``:
sr 24000, 80 mel bins, n_fft 1280, win 1280, hop 320 (75 fps), fmin 0, fmax 8000,
periodic hann window, ``center=False`` with manual reflect pad of ``(n_fft-hop)/2``,
magnitude ``sqrt(re^2+im^2+1e-9)``, Slaney-normalized mel filterbank, and
``log10(clamp(x, 1e-5))`` compression.

TPU design: the STFT is expressed as a framed matmul against precomputed
windowed-DFT basis matrices (cos/sin), so the whole pipeline —
frame -> window -> DFT -> magnitude -> mel projection -> log10 — is three MXU
matmuls plus fused elementwise ops under one ``jit``. ``jnp.fft.rfft`` is kept as
an alternative path (``use_fft=True``) for CPU debugging.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

MAX_WAV_VALUE = 32768.0


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24000
    n_mels: int = 80
    n_fft: int = 1280
    win_size: int = 1280
    hop_size: int = 320
    fmin: float = 0.0
    fmax: float = 8000.0
    clip_val: float = 1e-5

    @property
    def pad(self) -> int:
        return (self.n_fft - self.hop_size) // 2

    @classmethod
    def from_hparams(cls, hparams: dict) -> "MelConfig":
        """Accept the reference's hparam key names (``mel_spec_24k.py:300-316``)."""
        return cls(
            sample_rate=hparams.get("audio_sample_rate", 24000),
            n_mels=hparams.get("audio_num_mel_bins", 80),
            n_fft=hparams.get("fft_size", 1280),
            win_size=hparams.get("win_size", 1280),
            hop_size=hparams.get("hop_size", 320),
            fmin=hparams.get("fmin", 0.0),
            fmax=hparams.get("fmax", 8000.0),
        )


DEFAULT_MEL_CONFIG = MelConfig()


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape ``[n_mels, 1 + n_fft//2]``.

    Matches ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` defaults
    (htk=False, norm='slaney'), which is what the reference bakes into MelNet
    (``preprocess/NAT_mel.py:53``).
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, dtype=np.float64)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_size: int) -> np.ndarray:
    """Periodic Hann window (``torch.hann_window`` default)."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5) -> jnp.ndarray:
    return jnp.log10(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
    return jnp.power(10.0, x) / C


def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, T, n_fft] overlapping frames (center=False convention)."""
    num_frames = 1 + (y.shape[-1] - n_fft) // hop
    # Gather-based framing: XLA lowers this to an efficient strided gather.
    idx = np.arange(n_fft)[None, :] + hop * np.arange(num_frames)[:, None]
    return y[..., idx]


def _reflect_pad(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_size", "use_fft"))
def stft_magnitude(
    y: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    use_fft: bool = False,
) -> jnp.ndarray:
    """Magnitude STFT ``sqrt(|X|^2 + 1e-9)`` of pre-padded audio ``[B, L]``.

    Returns ``[B, 1 + n_fft//2, T]``. The default path computes the real DFT as
    two matmuls against windowed cos/sin bases — MXU-friendly and fusable.
    """
    frames = _frame(y, n_fft, hop_size)  # [B, T, n_fft]
    if use_fft:
        spec = jnp.fft.rfft(frames * window, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        n_bins = 1 + n_fft // 2
        k = np.arange(n_bins)[None, :]
        n = np.arange(n_fft)[:, None]
        ang = 2.0 * np.pi * k * n / n_fft
        cos_b = jnp.asarray(np.cos(ang), dtype=jnp.float32) * window[:, None]
        sin_b = jnp.asarray(-np.sin(ang), dtype=jnp.float32) * window[:, None]
        re = jnp.einsum("btn,nk->btk", frames, cos_b, preferred_element_type=jnp.float32)
        im = jnp.einsum("btn,nk->btk", frames, sin_b, preferred_element_type=jnp.float32)
        power = re * re + im * im
    mag = jnp.sqrt(power + 1e-9)
    return jnp.swapaxes(mag, -1, -2)  # [B, n_bins, T]


class MelSpectrogram:
    """Log-mel extractor. Call with waveform ``[L]`` or ``[B, L]`` in [-1, 1].

    Returns log10-mel ``[B, n_mels, T]`` with T = 1 + (L + 2*pad - n_fft)//hop,
    numerically matching the reference MelNet forward
    (``preprocess/NAT_mel.py:63-86``) to ~1e-4.
    """

    def __init__(self, config: MelConfig = DEFAULT_MEL_CONFIG, use_fft: bool = False):
        self.config = config
        self.use_fft = use_fft
        self.mel_basis = jnp.asarray(
            mel_filterbank(config.sample_rate, config.n_fft, config.n_mels, config.fmin, config.fmax)
        )
        self.window = jnp.asarray(hann_window(config.win_size))
        self._fn = jax.jit(self._forward)

    def _forward(self, y: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        y = jnp.clip(y, -1.0, 1.0)
        y = _reflect_pad(y, cfg.pad)
        mag = stft_magnitude(y, self.window, cfg.n_fft, cfg.hop_size, use_fft=self.use_fft)
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, mag, preferred_element_type=jnp.float32)
        return dynamic_range_compression(mel, clip_val=cfg.clip_val)

    def __call__(self, y) -> jnp.ndarray:
        y = jnp.asarray(y, dtype=jnp.float32)
        if y.ndim == 1:
            y = y[None]
        return self._fn(y)

    def num_frames(self, num_samples: int) -> int:
        cfg = self.config
        return 1 + (num_samples + 2 * cfg.pad - cfg.n_fft) // cfg.hop_size
