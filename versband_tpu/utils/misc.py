"""Small cross-cutting utilities (``ldm/util.py`` parity).

``count_params`` (:97-101), ``log_txt_as_img`` (:22-39, captions rendered to
arrays for TensorBoard), and a re-export of ``jax.checkpoint`` as the
gradient-checkpointing helper (the torch ``checkpoint`` fn,
``diffusionmodules/util.py:102-148``, is a training-memory tool — in JAX this
is ``jax.checkpoint``/``fnn.remat`` applied at module construction)."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

checkpoint = jax.checkpoint  # gradient checkpointing / rematerialization


def count_params(params, verbose: bool = False) -> int:
    """Total parameter count of a pytree (``ldm/util.py:97-101``)."""
    total = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(params)
                if hasattr(x, "shape"))
    if verbose:
        print(f"{total * 1e-6:.2f} M params.")
    return total


def download_checkpoint(url: str, local_path: str,
                        expected_md5: str = None) -> str:
    """Fetch a checkpoint with optional md5 verification
    (``ldm/util.py`` ckpt download helper). No-op if the file already exists
    and matches; raises on hash mismatch."""
    import hashlib
    import os
    import urllib.request

    def md5(path):
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    if os.path.exists(local_path) and (
            expected_md5 is None or md5(local_path) == expected_md5):
        return local_path
    os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
    print(f"Downloading {url} -> {local_path}")
    urllib.request.urlretrieve(url, local_path)
    if expected_md5 is not None and md5(local_path) != expected_md5:
        raise ValueError(f"md5 mismatch for {local_path}")
    return local_path


def log_txt_as_img(wh: Sequence[int], xc: Sequence[str]) -> np.ndarray:
    """Render caption strings into [B, 3, H, W] float arrays in [-1, 1]
    (``ldm/util.py:22-39``) for image loggers."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w, h = wh
    out = []
    for text in xc:
        fig = plt.figure(figsize=(w / 100, h / 100), dpi=100)
        fig.patch.set_facecolor("white")
        lines = "\n".join(text[i: i + 40] for i in range(0, len(text), 40))
        fig.text(0.02, 0.95, lines, va="top", fontsize=9, wrap=True)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
        plt.close(fig)
        img = buf.astype(np.float32) / 127.5 - 1.0
        out.append(img.transpose(2, 0, 1))
    return np.stack(out)
