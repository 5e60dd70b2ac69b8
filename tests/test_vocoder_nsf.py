"""NSF HiFi-GAN: sine source properties, generator shapes, f0-from-mel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.vocoder.nsf import (
    sine_gen, SourceModuleHnNSF, NSFHifiGanGenerator, estimate_f0_from_mel,
    stft_denoise, HifiGAN_NSF)


def test_sine_gen_voiced_periodicity_and_uv():
    sr = 24000
    T = 4800
    f0 = jnp.full((1, T, 1), 200.0)
    sines, uv = sine_gen(f0, jax.random.PRNGKey(0), sr, harmonic_num=2)
    assert sines.shape == (1, T, 3)
    assert np.all(np.asarray(uv) == 1.0)
    # fundamental ~200 Hz: dominant FFT bin near 200
    x = np.asarray(sines[0, :, 0])
    spec = np.abs(np.fft.rfft(x * np.hanning(T)))
    peak_hz = np.argmax(spec) * sr / T
    assert abs(peak_hz - 200.0) < 10.0, peak_hz

    # unvoiced -> noise only, low amplitude
    f0z = jnp.zeros((1, T, 1))
    noise, uvz = sine_gen(f0z, jax.random.PRNGKey(1), sr)
    assert np.all(np.asarray(uvz) == 0.0)
    assert np.abs(np.asarray(noise)).max() < 0.3


@pytest.mark.slow
def test_nsf_generator_shapes():
    gen = NSFHifiGanGenerator(upsample_initial_channel=16,
                              upsample_rates=(4, 4),
                              upsample_kernel_sizes=(8, 8),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3),))
    mel = jnp.zeros((1, 80, 10))
    f0 = jnp.full((1, 10), 150.0)
    params = gen.init({"params": jax.random.PRNGKey(0),
                       "source": jax.random.PRNGKey(1)}, mel, f0)
    wav = gen.apply(params, mel, f0, noise_key=jax.random.PRNGKey(2))
    assert wav.shape == (1, 160)
    # also runs without f0 (plain hifigan path)
    wav2 = gen.apply(params, mel, None)
    assert wav2.shape == (1, 160)


def test_estimate_f0_from_synthetic_mel():
    from versband_tpu.dsp.mel import mel_filterbank

    sr, n_fft, n_mels = 24000, 1280, 80
    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, 8000.0)
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    lin = np.zeros((len(freqs), 20), np.float32)
    lin[np.argmin(np.abs(freqs - 220.0))] = 10.0
    mel = np.log10(np.clip(fb @ lin, 1e-5, None))
    f0 = estimate_f0_from_mel(mel, sr, n_fft)
    assert f0.shape == (20,)
    assert abs(np.median(f0) - 220.0) < 25.0, np.median(f0)


def test_stft_denoise_reduces_noise_floor():
    rng = np.random.RandomState(0)
    t = np.arange(24000) / 24000
    clean = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noisy = clean + 0.01 * rng.randn(len(t)).astype(np.float32)
    den = stft_denoise(noisy, v=5.0)
    assert den.shape == noisy.shape
    assert np.isfinite(den).all()


@pytest.mark.slow
def test_wrapper_random_init():
    voc = HifiGAN_NSF(None, upsample_initial_channel=16,
                      upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                      resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),))
    mel = np.random.RandomState(0).randn(80, 8).astype(np.float32)
    wav = voc.spec2wav(mel, f0=np.full(8, 180.0, np.float32))
    assert wav.shape == (8 * 16,)
