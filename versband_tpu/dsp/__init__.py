from versband_tpu.dsp.mel import (
    MelSpectrogram,
    DEFAULT_MEL_CONFIG,
    mel_filterbank,
    hann_window,
    stft_magnitude,
    dynamic_range_compression,
    dynamic_range_decompression,
)
from versband_tpu.dsp.loudness import integrated_loudness, normalize_loudness
from versband_tpu.dsp.audio_io import load_wav, save_wav, get_wav_num_frames
