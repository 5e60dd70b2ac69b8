"""Waveform losses: multi-resolution STFT (``vocoder/parallel_wavegan/losses/
stft_loss.py:12-153``) — spectral convergence + log-magnitude L1 at three
resolutions. Pure jnp; STFT frames via gather + rFFT (static shapes)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def stft_magnitude(x: Array, fft_size: int, hop: int, win: int) -> Array:
    """|STFT| of [B, T] -> [B, frames, fft_size//2+1] with a hann window,
    sqrt-clamped at 1e-7 (``stft_loss.py:12-31``; torch.stft center=True)."""
    pad = fft_size // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    T = x.shape[1]
    n_frames = 1 + (T - fft_size) // hop
    idx = np.arange(fft_size)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[:, idx]
    window = jnp.asarray(np.hanning(win + 1)[:-1].astype(np.float32))
    if win < fft_size:
        lpad = (fft_size - win) // 2
        window = jnp.pad(window, (lpad, fft_size - win - lpad))
    spec = jnp.fft.rfft(frames * window, n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.clip(power, 1e-7, None))


def spectral_convergence_loss(x_mag: Array, y_mag: Array) -> Array:
    """||y - x||_F / ||y||_F (``stft_loss.py:34-52``)."""
    return jnp.linalg.norm(y_mag - x_mag) / (jnp.linalg.norm(y_mag) + 1e-12)


def log_stft_magnitude_loss(x_mag: Array, y_mag: Array) -> Array:
    """L1 on log magnitudes (``stft_loss.py:55-73``)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


def stft_loss(x: Array, y: Array, fft_size: int = 1024, hop: int = 120,
              win: int = 600) -> Tuple[Array, Array]:
    """(spectral convergence, log magnitude) for predicted x vs target y
    (``stft_loss.py:76-106``)."""
    x_mag = stft_magnitude(x, fft_size, hop, win)
    y_mag = stft_magnitude(y, fft_size, hop, win)
    return (spectral_convergence_loss(x_mag, y_mag),
            log_stft_magnitude_loss(x_mag, y_mag))


def multi_resolution_stft_loss(
    x: Array, y: Array,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
) -> Tuple[Array, Array]:
    """Averaged (sc, mag) over resolutions (``stft_loss.py:109-153``)."""
    sc_total, mag_total = 0.0, 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss(x, y, fs, hs, wl)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(fft_sizes)
    return sc_total / n, mag_total / n
