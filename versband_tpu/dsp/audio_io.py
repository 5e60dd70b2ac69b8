"""WAV IO + resampling on scipy (librosa/torchaudio/soundfile are not in the
image). Covers the reference preprocessing needs (``preprocess/mel_spec_24k.py``:
load -> mono -> resample -> loudness normalize)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str, target_sr: Optional[int] = None,
             mono: bool = True) -> Tuple[np.ndarray, int]:
    """Returns float32 waveform in [-1, 1] and its sample rate."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if mono and wav.ndim > 1:
        wav = wav.mean(axis=1)
    if target_sr and sr != target_sr:
        g = math.gcd(int(sr), int(target_sr))
        wav = resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
        sr = target_sr
    return wav, sr


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def get_wav_num_frames(path: str, target_sr: Optional[int] = None) -> int:
    """Frame count (after virtual resample) without decoding the payload."""
    import wave

    with wave.open(path, "rb") as f:
        n, sr = f.getnframes(), f.getframerate()
    if target_sr and sr != target_sr:
        return int(round(n * target_sr / sr))
    return n
