"""Checkpoint utilities: npz param trees, step-globbed dirs, partial loading.

Capability mirror of ``utils/commons/ckpt_utils.py:7-67`` (``get_last_checkpoint``
by step glob, ``load_ckpt`` with sub-model remapping and shape-mismatch pruning)
plus flat-npz serialization for converted torch weights. Orbax handles the
training checkpoints (see versband_tpu.train.checkpoints); npz is the exchange
format for torch->jax converted inference weights.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/" if not prefix else f"{prefix}{k}/"))
        return out
    out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_npz_params(path: str, params: Any) -> None:
    flat = flatten_params(params)
    np.savez(path, **flat)


def load_npz_params(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


def get_last_checkpoint(ckpt_dir: str, steps: Optional[int] = None
                        ) -> Tuple[Optional[str], Optional[str]]:
    """Newest ``model_ckpt_steps_*`` file by step number (``ckpt_utils.py:7-21``).
    Works for both orbax dirs and npz files."""
    if steps is not None:
        pattern = os.path.join(ckpt_dir, f"model_ckpt_steps_{steps}.*")
    else:
        pattern = os.path.join(ckpt_dir, "model_ckpt_steps_*")
    paths = glob.glob(pattern)
    if not paths:
        return None, ckpt_dir
    paths.sort(key=lambda p: int(re.findall(r"steps_(\d+)", p)[0]))
    return paths[-1], ckpt_dir


def load_ckpt(params: Any, ckpt_base_dir: str, model_name: str = "model",
              force: bool = True, strict: bool = True) -> Any:
    """Load newest checkpoint params into an existing tree, pruning any leaf
    whose shape mismatches (``ckpt_utils.py:24-67`` semantics: warn+skip)."""
    if os.path.isfile(ckpt_base_dir):
        path, _ = ckpt_base_dir, None
    else:
        path, _ = get_last_checkpoint(ckpt_base_dir)
    if path is None:
        if force:
            raise FileNotFoundError(f"no checkpoint in {ckpt_base_dir}")
        return params
    loaded = load_npz_params(path)
    if model_name in loaded:
        loaded = loaded[model_name]
    return merge_matching(params, loaded, strict=strict)


def merge_matching(params: Any, loaded: Any, strict: bool = True,
                   path: str = "") -> Any:
    """Overlay ``loaded`` onto ``params``; shape mismatches keep the original
    (printed, as the reference does)."""
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = merge_matching(v, loaded[k], strict, f"{path}/{k}")
            else:
                if strict:
                    print(f"| missing key in checkpoint: {path}/{k}")
                out[k] = v
        return out
    arr = np.asarray(loaded)
    if tuple(arr.shape) != tuple(np.shape(params)):
        print(f"| shape mismatch at {path}: ckpt {arr.shape} vs model "
              f"{np.shape(params)} — keeping model init")
        return params
    return jax.numpy.asarray(arr, dtype=jax.numpy.asarray(params).dtype)
