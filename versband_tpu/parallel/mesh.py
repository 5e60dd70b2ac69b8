"""Device mesh construction — the TPU-native replacement for NCCL process groups.

The reference's only training parallelism is Lightning DDP over NCCL
(``main.py:657``); here scale-out is a 2-D ``jax.sharding.Mesh``:

  * ``'data'``  — batch (DP); gradient all-reduce rides ICI automatically.
  * ``'model'`` — tensor parallel (attention heads / FFN hidden) and expert
    parallel (the Band-MOE stacked-expert leading axis) — the TP/EP that is
    only vestigial in the reference (``flag_large_dit_moe.py:167-170``,
    SURVEY.md §2.10) made real.

Multi-slice deployments put ``'data'`` on DCN and ``'model'`` on ICI by listing
the data axis first over the slice dimension (device order from
``mesh_utils.create_device_mesh`` already does this for TPU topologies).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``n_data=None`` uses all remaining devices.

    On real TPU topologies, uses ``mesh_utils.create_device_mesh`` so the
    'model' axis lands on contiguous ICI neighbours; on CPU/virtual devices it
    falls back to a plain reshape.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) needs "
            f"{n_data * n_model} devices but only {n} are available")
    if n_data * n_model != n:
        import warnings

        warnings.warn(f"mesh ({n_data} x {n_model}) uses only "
                      f"{n_data * n_model} of {n} devices", stacklevel=2)
        devices = devices[: n_data * n_model]
    shape = (n_data, n_model)
    if devices and devices[0].platform == "tpu":
        try:
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
        except Exception:
            dev_array = np.asarray(devices).reshape(shape)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
