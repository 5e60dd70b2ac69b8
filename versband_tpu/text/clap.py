"""CLAP — contrastive language-audio model for prompt conditioning and
zero-shot evaluation.

Re-design of ``ldm/modules/encoders/CLAP/`` (``clap.py:8-100``: Projection /
AudioEncoder / TextEncoder / CLAP; ``audio.py:13-178``: Cnn14 tower;
``CLAPWrapper.py:18-237``: zero-shot similarity), with the config defaults of
``CLAP/config.yml`` (BERT-base text tower, d_proj 1024, Cnn14 at 44.1 kHz,
64 mel bins).

The audio front-end (center STFT -> log-mel, torchlibrosa in the reference)
uses this framework's own mel utilities. Eval-mode only (no dropout) — CLAP
is always frozen in the reference pipelines.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.dsp.mel import mel_filterbank, hann_window

Array = jax.Array


class Projection(fnn.Module):
    """ln(l1(x) + l2(gelu(l1(x)))) (``clap.py:8-20``), eval mode."""

    d_out: int

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        e1 = fnn.Dense(self.d_out, use_bias=False, name="linear1")(x)
        e2 = fnn.Dense(self.d_out, use_bias=False, name="linear2")(
            fnn.gelu(e1, approximate=False))
        return fnn.LayerNorm(name="layer_norm")(e1 + e2)


class ConvBlock(fnn.Module):
    """Two 3x3 conv -> eval-BN -> ReLU, then avg pool (``audio.py:13-49``).

    Eval-mode ``nn.BatchNorm2d`` is a per-channel AFFINE transform through the
    running statistics — NOT a normalization of the incoming batch — so it is
    represented here as folded (scale, bias) pairs; the converter computes
    ``scale = gamma / sqrt(running_var + eps)`` and
    ``bias = beta - running_mean * scale`` (CLAP is always frozen in the
    reference pipelines, so train-mode BN never occurs)."""

    out_channels: int

    @fnn.compact
    def __call__(self, x: Array, pool: Tuple[int, int] = (2, 2)) -> Array:
        for i in (1, 2):
            x = fnn.Conv(self.out_channels, (3, 3), padding="SAME",
                         use_bias=False, name=f"conv{i}")(x)
            scale = self.param(f"bn{i}_scale", fnn.initializers.ones,
                               (self.out_channels,))
            bias = self.param(f"bn{i}_bias", fnn.initializers.zeros,
                              (self.out_channels,))
            x = fnn.relu(x * scale + bias)
        if pool != (1, 1):
            x = fnn.avg_pool(x, pool, strides=pool)
        return x


def _clap_logmel(wav: Array, sr: int, n_fft: int, hop: int,
                 mel_bins: int, fmin: float, fmax: float) -> Array:
    """Center-padded |STFT|^2 -> mel -> 10*log10 power dB (torchlibrosa
    Spectrogram+LogmelFilterBank semantics, amin 1e-10)."""
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    T = x.shape[1]
    n_frames = 1 + (T - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[:, idx] * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [B, T', F]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, mel_bins, fmin, fmax))
    mel = power @ fb.T
    return 10.0 * jnp.log10(jnp.clip(mel, 1e-10, None))  # [B, T', M]


class Cnn14(fnn.Module):
    """AudioSet CNN tower (``audio.py:107-178``), eval mode."""

    sample_rate: int = 44100
    window_size: int = 1024
    hop_size: int = 320
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    classes_num: int = 527
    out_emb: int = 2048
    channels: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048)

    @fnn.compact
    def __call__(self, wav: Array) -> Dict[str, Array]:
        mel = _clap_logmel(wav, self.sample_rate, self.window_size,
                           self.hop_size, self.mel_bins, self.fmin, self.fmax)
        x = mel[:, :, :, None]  # NHWC: [B, T, M, 1]
        # bn0 over the mel axis (eval-mode BN folded to affine, as above)
        scale = self.param("bn0_scale", fnn.initializers.ones, (self.mel_bins,))
        bias = self.param("bn0_bias", fnn.initializers.zeros, (self.mel_bins,))
        x = x * scale[None, None, :, None] + bias[None, None, :, None]
        chans = self.channels
        for i, ch in enumerate(chans):
            pool = (1, 1) if i == len(chans) - 1 else (2, 2)
            x = ConvBlock(ch, name=f"conv_block{i + 1}")(x, pool)
        x = x.mean(axis=2)                    # mean over mel axis -> [B, T, C]
        x = x.max(axis=1) + x.mean(axis=1)    # temporal max+mean pooling
        x = fnn.relu(fnn.Dense(self.out_emb, name="fc1")(x))
        clipwise = fnn.sigmoid(fnn.Dense(self.classes_num,
                                         name="fc_audioset")(x))
        return {"embedding": x, "clipwise_output": clipwise}


class AudioEncoder(fnn.Module):
    """Cnn14 + projection (``clap.py:22-40``)."""

    d_out: int = 1024
    cnn_kwargs: Any = None

    @fnn.compact
    def __call__(self, wav: Array) -> Tuple[Array, Array]:
        out = Cnn14(**(self.cnn_kwargs or {}), name="base")(wav)
        proj = Projection(self.d_out, name="projection")(out["embedding"])
        return proj, out["clipwise_output"]


class CLAP:
    """Full CLAP: audio tower + BERT caption tower + temperature
    (``clap.py:54-100``). Text side reuses the ClapTextEmbedder tower."""

    def __init__(self, d_proj: int = 1024, text_model: str = "bert-base-uncased",
                 sample_rate: int = 44100, duration: float = 5.0,
                 cnn_kwargs: Optional[dict] = None, seed: int = 0, **kw):
        from versband_tpu.text.embedders import _FrozenBertTower, \
            _projection_params, projection_apply

        self.sample_rate = sample_rate
        self.duration = duration
        self.audio_encoder = AudioEncoder(d_proj, cnn_kwargs)
        self.audio_params = None
        self.text_tower = _FrozenBertTower(text_model,
                                           fallback_config=kw.get("fallback_config"))
        d_in = self.text_tower.model.config.hidden_size
        self.text_proj = _projection_params(jax.random.PRNGKey(seed), d_in,
                                            d_proj)
        self._project = projection_apply
        self.logit_scale = float(np.log(1.0 / 0.07))
        self._audio_apply = jax.jit(
            lambda p, w: self.audio_encoder.apply(p, w))

    def ensure_audio_params(self, wav_shape):
        if self.audio_params is None:
            self.audio_params = self.audio_encoder.init(
                jax.random.PRNGKey(0), jnp.zeros(wav_shape))
        return self.audio_params

    def load_converted(self, tree: Dict[str, Any]) -> None:
        """Ingest a converted reference checkpoint (``convert_state_dict``
        family='clap' over the ``.pth``'s ['model'] state dict,
        ``CLAPWrapper.py:60-62``): audio tower params, caption-side
        projection, logit_scale; the BERT tower weights ride separately via
        ``export_clap_bert`` -> ``from_pretrained``."""
        params = tree.get("params", tree)
        if "audio_encoder" in params:
            self.audio_params = {"params": params["audio_encoder"]}
        cap = params.get("caption_encoder", {})
        if "projection" in cap:
            p = cap["projection"]
            self.text_proj = {
                "linear1": jnp.asarray(p["linear1"]["kernel"]),
                "linear2": jnp.asarray(p["linear2"]["kernel"]),
                "ln_scale": jnp.asarray(p["layer_norm"]["scale"]),
                "ln_bias": jnp.asarray(p["layer_norm"]["bias"]),
            }
        if "logit_scale" in params:
            self.logit_scale = float(np.asarray(params["logit_scale"]))

    def get_audio_embeddings(self, wavs: Array) -> Array:
        wavs = jnp.asarray(wavs)
        emb, _ = self._audio_apply(self.ensure_audio_params(wavs.shape), wavs)
        return emb

    def get_text_embeddings(self, texts: Sequence[str]) -> Array:
        z = self.text_tower(list(texts))[:, 0, :]  # CLS token (clap.py:48-51)
        return self._project(self.text_proj, z)

    def compute_similarity(self, audio_emb: Array, text_emb: Array) -> Array:
        """Scaled cosine-similarity logits (``CLAPWrapper.py`` semantics)."""
        a = audio_emb / (jnp.linalg.norm(audio_emb, axis=-1, keepdims=True) + 1e-8)
        t = text_emb / (jnp.linalg.norm(text_emb, axis=-1, keepdims=True) + 1e-8)
        return float(np.exp(self.logit_scale)) * a @ t.T


class CLAPWrapper:
    """Zero-shot classification wrapper (``CLAPWrapper.py:18-237``): rank
    candidate captions for audio files/arrays."""

    def __init__(self, model_fp: Optional[str] = None, use_cuda: bool = False,
                 **clap_kwargs):
        self.clap = CLAP(**clap_kwargs)
        # model_fp: converted weights npz (optional; random init otherwise)
        if model_fp and model_fp.endswith(".npz"):
            try:
                from versband_tpu.utils.checkpoint import load_npz_params

                self.clap.load_converted(load_npz_params(model_fp))
            except Exception as e:
                print(f"CLAPWrapper: could not load {model_fp}: {e}")

    def classify_audio(self, wav: np.ndarray, captions: Sequence[str]) -> np.ndarray:
        a = self.clap.get_audio_embeddings(np.asarray(wav)[None])
        t = self.clap.get_text_embeddings(captions)
        sims = self.clap.compute_similarity(a, t)
        return np.asarray(jax.nn.softmax(sims, axis=-1))[0]
