from versband_tpu.dsp.mel import (
    MelSpectrogram,
    DEFAULT_MEL_CONFIG,
    mel_filterbank,
    hann_window,
    stft_magnitude,
    dynamic_range_compression,
    dynamic_range_decompression,
)
