"""Golden parity tests for the mel front-end vs an independent torch.stft pipeline
built from the documented reference constants (preprocess/NAT_mel.py:63-86)."""

import numpy as np
import pytest

from versband_tpu.dsp import MelSpectrogram, mel_filterbank, hann_window
from versband_tpu.dsp.mel import MelConfig


def torch_reference_mel(wav: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Independent torch implementation of the documented mel pipeline."""
    import torch

    y = torch.from_numpy(wav).float().clamp(-1.0, 1.0)
    if y.ndim == 1:
        y = y[None]
    pad = (cfg.n_fft - cfg.hop_size) // 2
    y = torch.nn.functional.pad(y[:, None], (pad, pad), mode="reflect")[:, 0]
    window = torch.hann_window(cfg.win_size)
    spec = torch.stft(
        y, cfg.n_fft, hop_length=cfg.hop_size, win_length=cfg.win_size,
        window=window, center=False, normalized=False, onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    mel_b = torch.from_numpy(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = torch.matmul(mel_b, mag)
    return torch.log10(torch.clamp(mel, min=1e-5)).numpy()


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    t = np.arange(24000 * 2) / 24000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1320 * t)
    sig += 0.05 * rng.standard_normal(t.shape)
    return np.clip(sig, -1, 1).astype(np.float32)


def test_mel_filterbank_shape():
    fb = mel_filterbank(24000, 1280, 80, 0.0, 8000.0)
    assert fb.shape == (80, 641)
    # Slaney normalization: each filter integrates to ~2/bandwidth; rows nonzero
    assert (fb.sum(axis=1) > 0).all()
    # Filters cover only up to fmax=8000 Hz -> bins above 8k are all zero
    freqs = np.linspace(0, 12000, 641)
    assert fb[:, freqs > 8100].sum() == 0.0


def test_hann_window_periodic():
    import torch

    np.testing.assert_allclose(hann_window(1280), torch.hann_window(1280).numpy(), atol=1e-6)


def test_mel_parity_vs_torch(wav):
    cfg = MelConfig()
    ref = torch_reference_mel(wav, cfg)
    # FFT path: near-exact
    ours_fft = np.asarray(MelSpectrogram(cfg, use_fft=True)(wav))
    assert ours_fft.shape == ref.shape and ref.shape[1] == 80
    mse_fft = float(np.mean((ours_fft - ref) ** 2))
    assert mse_fft < 1e-6, f"fft-path mel MSE too high: {mse_fft}"
    # MXU matmul-DFT path: f32 accumulation over n_fft, still far below the
    # 1e-3 BASELINE target
    ours_mm = np.asarray(MelSpectrogram(cfg, use_fft=False)(wav))
    mse_mm = float(np.mean((ours_mm - ref) ** 2))
    assert mse_mm < 1e-4, f"matmul-path mel MSE too high: {mse_mm}"


def test_mel_fft_and_matmul_paths_agree(wav):
    cfg = MelConfig()
    a = np.asarray(MelSpectrogram(cfg, use_fft=False)(wav))
    b = np.asarray(MelSpectrogram(cfg, use_fft=True)(wav))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_mel_frame_count(wav):
    cfg = MelConfig()
    m = MelSpectrogram(cfg)
    out = m(wav)
    assert out.shape[-1] == m.num_frames(len(wav))
    # 75 frames per second at 24kHz/hop320
    assert abs(out.shape[-1] - 150) <= 1  # 2s of audio


def test_mel_batched(wav):
    cfg = MelConfig()
    m = MelSpectrogram(cfg)
    batch = np.stack([wav, wav * 0.5])
    out = m(batch)
    assert out.shape[0] == 2
    single = m(wav)
    np.testing.assert_allclose(out[0], single[0], atol=1e-5)
