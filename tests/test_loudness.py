"""BS.1770 loudness: sine-wave reference level and normalization round-trip."""

import numpy as np

from versband_tpu.dsp.loudness import integrated_loudness, normalize_loudness


def test_sine_reference_level():
    # BS.1770: a 997 Hz sine at digital full scale reads ~ -3.01 LUFS
    sr = 48000
    t = np.arange(sr * 3) / sr
    x = np.sin(2 * np.pi * 997 * t)
    lufs = integrated_loudness(x, sr)
    assert abs(lufs - (-3.01)) < 0.3, lufs
    # -20 dBFS sine -> ~ -23 LUFS
    lufs2 = integrated_loudness(0.1 * x, sr)
    assert abs(lufs2 - (-23.01)) < 0.3, lufs2


def test_normalize_round_trip():
    rng = np.random.RandomState(0)
    x = rng.randn(24000 * 2).astype(np.float32) * 0.05
    y = normalize_loudness(x, -23.0, 24000)
    assert abs(integrated_loudness(y, 24000) - (-23.0)) < 0.5


def test_gain_cap():
    x = np.sin(2 * np.pi * 997 * np.arange(48000) / 24000) * 1e-4  # very quiet
    y = normalize_loudness(x, -14.0, 24000, max_gain_db=20.0)
    gain = np.max(np.abs(y)) / np.max(np.abs(x))
    assert gain <= 10 ** (20 / 20) + 1e-3  # capped at +20 dB


def test_silence_does_not_blow_up():
    y = normalize_loudness(np.zeros(24000, np.float32), -23.0, 24000)
    assert np.isfinite(y).all()
