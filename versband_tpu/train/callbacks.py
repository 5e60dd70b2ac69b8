"""Training callbacks: setup/config archival, mel-image + audio logging,
device stats — the TPU equivalents of ``main.py:347-596``.

  * ``SetupCallback``  — logdir layout, config dump to ``<logdir>/configs``
    (``main.py:347-395``).
  * ``ImageLogger``    — renders logged mel dicts to PNGs under
    ``<logdir>/images/<split>`` and TensorBoard, on a step schedule
    (``main.py:397-490``).
  * ``AudioLogger``    — subclass that also vocodes sampled mels to 24 kHz
    wavs (scipy WAV writer; soundfile isn't in the image) and logs them
    (``main.py:493-573``).
  * ``DeviceStatsCallback`` — epoch wall time + per-device memory stats via
    ``jax.local_devices()[i].memory_stats()`` (the CUDA-callback analogue,
    ``main.py:576-596``).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np

from versband_tpu.utils.config import config_to_yaml, instantiate_from_config


class Callback:
    def on_fit_start(self, trainer):
        pass

    def on_train_batch_end(self, trainer, batch, metrics, step: int):
        pass

    def on_epoch_start(self, trainer, epoch: int):
        pass

    def on_epoch_end(self, trainer, epoch: int):
        pass

    def on_exception(self, trainer):
        pass


class SetupCallback(Callback):
    def __init__(self, resume: bool, now: str, logdir: str, ckptdir: str,
                 cfgdir: str, config, lightning_config=None, **kw):
        self.resume = resume
        self.now = now
        self.logdir = logdir
        self.ckptdir = ckptdir
        self.cfgdir = cfgdir
        self.config = config
        self.lightning_config = lightning_config

    def on_fit_start(self, trainer):
        for d in (self.logdir, self.ckptdir, self.cfgdir):
            os.makedirs(d, exist_ok=True)
        with open(os.path.join(self.cfgdir, f"{self.now}-project.yaml"), "w") as f:
            f.write(config_to_yaml(self.config))
        if self.lightning_config is not None:
            with open(os.path.join(self.cfgdir,
                                   f"{self.now}-lightning.yaml"), "w") as f:
                f.write(config_to_yaml(self.lightning_config))

    def on_exception(self, trainer):
        # crash checkpoint (main.py:359-363)
        print("Summoning checkpoint.")
        trainer.save_checkpoint("last")


def _mel_to_png(mel: np.ndarray, path: str, vmin=-5.0, vmax=1.5):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 3))
    ax.imshow(mel, origin="lower", aspect="auto", vmin=vmin, vmax=vmax,
              cmap="magma")
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.savefig(path, dpi=100)
    plt.close(fig)


class ImageLogger(Callback):
    """Log model-provided mel images every ``batch_frequency`` steps."""

    def __init__(self, batch_frequency: int = 5000, max_images: int = 8,
                 clamp: bool = True, increase_log_steps: bool = True,
                 rescale: bool = True, melvmin: float = -5.0,
                 melvmax: float = 1.5, for_specs: bool = True, **kw):
        self.batch_freq = batch_frequency
        self.max_images = max_images
        self.melvmin = melvmin
        self.melvmax = melvmax
        self.log_steps = ([2 ** n for n in range(int(np.log2(batch_frequency)) + 1)]
                          if increase_log_steps else [batch_frequency])

    def check_frequency(self, step: int) -> bool:
        return step % self.batch_freq == 0 or step in self.log_steps

    def log_img(self, trainer, images: Dict[str, np.ndarray], step: int,
                split: str = "train"):
        root = os.path.join(trainer.logdir, "images", split)
        os.makedirs(root, exist_ok=True)
        for name, mels in images.items():
            mels = np.asarray(mels)[: self.max_images]
            for i, mel in enumerate(mels):
                mel2d = mel[0] if mel.ndim == 3 else mel
                path = os.path.join(
                    root, f"{name}_gs-{step:06}_{i:02}.png")
                _mel_to_png(mel2d, path, self.melvmin, self.melvmax)
                if trainer.writer is not None:
                    trainer.writer.add_image(
                        f"{split}/{name}_{i}",
                        np.clip((mel2d - self.melvmin)
                                / (self.melvmax - self.melvmin), 0, 1)[None],
                        step)

    def on_train_batch_end(self, trainer, batch, metrics, step: int):
        if not self.check_frequency(step):
            return
        if hasattr(trainer, "log_images"):
            images = trainer.log_images(batch)
            if images:
                self.log_img(trainer, images, step)


class AudioLogger(ImageLogger):
    """Also vocode sampled mels to audio (``main.py:493-573``)."""

    def __init__(self, sample_rate: int = 24000, vocoder_cfg=None, **kw):
        super().__init__(**kw)
        self.sample_rate = sample_rate
        self.vocoder = None
        if vocoder_cfg is not None:
            try:
                self.vocoder = instantiate_from_config(vocoder_cfg)
            except Exception as e:
                print(f"AudioLogger: vocoder unavailable ({e}); mel-only logging")

    def _write_wav(self, path: str, wav: np.ndarray):
        from scipy.io import wavfile

        wav = np.clip(wav, -1.0, 1.0)
        wavfile.write(path, self.sample_rate,
                      (wav * 32767).astype(np.int16))

    def log_img(self, trainer, images: Dict[str, np.ndarray], step: int,
                split: str = "train"):
        super().log_img(trainer, images, step, split)
        if self.vocoder is None:
            return
        root = os.path.join(trainer.logdir, "audio", split)
        os.makedirs(root, exist_ok=True)
        for name, mels in images.items():
            mels = np.asarray(mels)[: self.max_images]
            for i, mel in enumerate(mels):
                mel2d = mel[0] if mel.ndim == 3 else mel
                wav = self.vocoder.vocode(mel2d)
                path = os.path.join(root, f"{name}_gs-{step:06}_{i:02}.wav")
                self._write_wav(path, wav)
                if trainer.writer is not None:
                    trainer.writer.add_audio(
                        f"{split}/{name}_audio_{i}", wav[None, :],
                        step, sample_rate=self.sample_rate)


class DeviceStatsCallback(Callback):
    """Epoch time + device memory (``main.py:576-596``)."""

    def on_epoch_start(self, trainer, epoch: int):
        self._t0 = time.time()

    def on_epoch_end(self, trainer, epoch: int):
        import jax

        dt = time.time() - self._t0
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0) / 2 ** 20
            print(f"Epoch {epoch}: {dt:.2f} s, peak device memory {peak:.2f} MiB")
        except Exception:
            print(f"Epoch {epoch}: {dt:.2f} s")
