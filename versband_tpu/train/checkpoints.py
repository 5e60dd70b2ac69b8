"""Training checkpoints via orbax: monitored top-k + last + exception saves.

Capability mirror of the reference's Lightning ``ModelCheckpoint`` setup
(``main.py:705-790``: top-k on a monitored metric, always-updated ``last``,
optional every-N-steps ``trainstep_checkpoints`` archive, crash checkpoint
``main.py:359-363``), the model-level partial loading of ``ddpm.py:184-200``
(``ignore_keys`` prefix pruning, ``load_only_unet``), and resume-from-logdir
(``main.py:614-630``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from versband_tpu.utils.checkpoint import load_npz_params, merge_matching


class CheckpointManager:
    """Top-k + last checkpoints under ``<logdir>/checkpoints``."""

    def __init__(self, ckpt_dir: str, monitor: Optional[str] = None,
                 mode: str = "min", save_top_k: int = 3,
                 every_n_train_steps: Optional[int] = None):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.every_n_train_steps = every_n_train_steps
        self._scores: List[Dict[str, Any]] = self._load_index()

    # -- index of monitored checkpoints ---------------------------------
    @property
    def _index_path(self) -> str:
        return os.path.join(self.ckpt_dir, "index.json")

    def _load_index(self) -> List[Dict[str, Any]]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return []

    def _save_index(self) -> None:
        with open(self._index_path, "w") as f:
            json.dump(self._scores, f, indent=2)

    # -- save / restore --------------------------------------------------
    def _write(self, name: str, state: Any) -> str:
        path = os.path.join(self.ckpt_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state))
        ckptr.wait_until_finished()
        return path

    def save_last(self, state: Any, step: int,
                  extra: Optional[Dict[str, Any]] = None) -> str:
        """``extra`` carries run-level scalars that live OUTSIDE the train
        state but must survive resume/inference — e.g. the scale_by_std
        latent scale factor (a buffer in the reference's checkpoints,
        ``ddpm_audio.py:89-104``)."""
        path = self._write("last", state)
        meta = {"step": int(step), **(extra or {})}
        with open(os.path.join(self.ckpt_dir, "last_step.json"), "w") as f:
            json.dump(meta, f)
        return path

    def save_step_archive(self, state: Any, step: int) -> Optional[str]:
        if (self.every_n_train_steps
                and step % self.every_n_train_steps == 0 and step > 0):
            return self._write(f"model_ckpt_steps_{step}", state)
        return None

    def save_monitored(self, state: Any, step: int,
                       metrics: Dict[str, float]) -> Optional[str]:
        if self.monitor is None or self.monitor not in metrics:
            return None
        score = float(metrics[self.monitor])
        name = f"epoch_step_{step}"
        better = sorted(
            self._scores + [{"name": name, "score": score, "step": int(step)}],
            key=lambda r: r["score"], reverse=(self.mode == "max"))
        keep = better[: self.save_top_k]
        if not any(r["name"] == name for r in keep):
            return None
        path = self._write(name, state)
        evicted = [r for r in self._scores if r not in keep]
        for r in evicted:
            p = os.path.join(self.ckpt_dir, r["name"])
            if os.path.exists(p):
                shutil.rmtree(p)
        self._scores = keep
        self._save_index()
        return path

    def restore_last(self, target: Any) -> Any:
        path = os.path.join(self.ckpt_dir, "last")
        if not os.path.exists(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=jax.device_get(target))

    def last_meta(self) -> Dict[str, Any]:
        p = os.path.join(self.ckpt_dir, "last_step.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def last_step(self) -> int:
        return int(self.last_meta().get("step", 0))


def prune_ignored(params: Any, ignore_keys=()) -> Any:
    """Drop subtrees whose '/'-joined path starts with an ignore_keys prefix
    (``ddpm.py:190-196``)."""

    def walk(node, prefix):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            path = f"{prefix}{k}"
            if any(path.startswith(ig) for ig in ignore_keys):
                print(f"Deleting key {path} from state_dict.")
                continue
            out[k] = walk(v, path + "/")
        return out

    return walk(params, "")


def _extract_model_params(tree: Any) -> Any:
    """Pull the model param tree out of a restored trainer checkpoint.

    Trainer checkpoints hold full TrainStates — stage 1 even a
    ``{"gen": TrainState, "disc": TrainState}`` pair — but cross-stage
    consumers (CFM's frozen ``first_stage_config.params.ckpt_path``,
    ``cli.generate --ckpt``) want only the model params, mirroring the
    reference's ``state_dict`` extraction (``ddpm.py:184-188``)."""
    if isinstance(tree, dict):
        if "gen" in tree and "disc" in tree:
            return _extract_model_params(tree["gen"])
        if "params" in tree and ("opt_state" in tree or "step" in tree):
            return tree["params"]
    return tree


def _count_matching_leaves(params: Any, loaded: Any) -> int:
    """Number of leaves in ``params`` that ``loaded`` would actually
    overwrite (same path, same shape) under ``merge_matching``."""
    if isinstance(params, dict):
        if not isinstance(loaded, dict):
            return 0
        return sum(_count_matching_leaves(v, loaded[k])
                   for k, v in params.items() if k in loaded)
    try:
        return int(tuple(np.shape(loaded)) == tuple(np.shape(params)))
    except Exception:
        return 0


def load_model_checkpoint(params: Any, path: str, ignore_keys=(),
                          only_model_key: Optional[str] = None) -> Any:
    """Partial restore from an npz or orbax dir into an existing param tree,
    with shape-mismatch pruning (``ddpm.py:184-200`` semantics)."""
    if os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        try:
            loaded = ckptr.restore(path, target=jax.device_get(params))
        except Exception:
            # checkpoint tree isn't the bare param tree (a trainer's
            # TrainState / gen+disc pair): raw-restore and extract. A
            # genuinely unreadable checkpoint raises here (not silently
            # degrading into a no-op partial load).
            loaded = _extract_model_params(ckptr.restore(path))
            if _count_matching_leaves(params, loaded) == 0:
                raise ValueError(
                    f"checkpoint at {path} restored but no leaf matches the "
                    f"target tree (wrong checkpoint, or corrupt structure)")
    else:
        loaded = load_npz_params(path)
    loaded = prune_ignored(loaded, ignore_keys)
    if only_model_key and only_model_key in loaded:
        loaded = {only_model_key: loaded[only_model_key]}
    return merge_matching(params, loaded, strict=False)
