"""LR schedules mirroring the reference's ``ldm/lr_scheduler.py``.

Each scheduler is a callable ``step -> multiplier`` (the reference applies them
through torch ``LambdaLR`` on top of the base LR, ``ddpm_audio.py:865-887``);
``as_optax`` returns the multiplied schedule for optax. All are closed-form
functions of the step, so they live inside jit without host state.

``LambdaLinearScheduler`` with the shipped config (``configs/vocal2music.yaml:
20-31``: 10k warmup then linear decay over 1e13 steps) is effectively constant
after warmup — reproduced exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _first(x):
    return float(x[0]) if isinstance(x, (list, tuple)) else float(x)


class LambdaWarmUpCosineScheduler:
    """Warmup to lr_max then cosine to lr_min over lr_max_decay_steps
    (``ldm/lr_scheduler.py:4-36``)."""

    def __init__(self, warm_up_steps, lr_min, lr_max, lr_start, max_decay_steps,
                 verbosity_interval: int = 0):
        self.warm_up_steps = int(warm_up_steps)
        self.lr_min = float(lr_min)
        self.lr_max = float(lr_max)
        self.lr_start = float(lr_start)
        self.max_decay_steps = int(max_decay_steps)

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        warm = (self.lr_max - self.lr_start) / max(self.warm_up_steps, 1) * step \
            + self.lr_start
        t = (step - self.warm_up_steps) / max(
            self.max_decay_steps - self.warm_up_steps, 1)
        t = jnp.minimum(t, 1.0)
        cos = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + jnp.cos(t * np.pi))
        return jnp.where(step < self.warm_up_steps, warm, cos)


class LambdaWarmUpCosineScheduler2:
    """Cyclic warmup-cosine over ``cycle_lengths`` (``ldm/lr_scheduler.py:39-81``).
    Only the first cycle's parameters are used once past the last cycle."""

    def __init__(self, warm_up_steps: Sequence[int], f_min, f_max, f_start,
                 cycle_lengths: Sequence[int], verbosity_interval: int = 0):
        self.warm_up_steps = [int(w) for w in warm_up_steps]
        self.f_min = [float(v) for v in (f_min if isinstance(f_min, (list, tuple)) else [f_min])]
        self.f_max = [float(v) for v in (f_max if isinstance(f_max, (list, tuple)) else [f_max])]
        self.f_start = [float(v) for v in (f_start if isinstance(f_start, (list, tuple)) else [f_start])]
        self.cycle_lengths = [int(c) for c in cycle_lengths]
        self.cum_cycles = np.concatenate([[0], np.cumsum(self.cycle_lengths)])

    def find_cycle(self, step: float) -> int:
        for i, cum in enumerate(self.cum_cycles[1:]):
            if step < cum:
                return i
        return len(self.cycle_lengths) - 1

    def __call__(self, step):
        # host-side (python int/float) evaluation; cycles make this data-dependent
        s = float(step)
        c = self.find_cycle(s)
        s = s - self.cum_cycles[c]
        if s < self.warm_up_steps[c]:
            return (self.f_max[c] - self.f_start[c]) / self.warm_up_steps[c] * s \
                + self.f_start[c]
        t = (s - self.warm_up_steps[c]) / (
            self.cycle_lengths[c] - self.warm_up_steps[c])
        t = min(t, 1.0)
        return self.f_min[c] + 0.5 * (self.f_max[c] - self.f_min[c]) * (
            1 + np.cos(t * np.pi))


class LambdaLinearScheduler(LambdaWarmUpCosineScheduler2):
    """Linear warmup then linear decay per cycle (``ldm/lr_scheduler.py:84-98``).

    Jit-friendly: ``__call__`` is pure jnp using the first cycle (the shipped
    config has one cycle of 1e13 steps).
    """

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        w = max(self.warm_up_steps[0], 1)
        # float arithmetic throughout: the shipped cycle length is 1e13,
        # which overflows int32 under jit weak-typing
        cl = float(self.cycle_lengths[0])
        warm = (self.f_max[0] - self.f_start[0]) / w * step + self.f_start[0]
        decay = self.f_min[0] + (self.f_max[0] - self.f_min[0]) * (
            cl - step) / cl
        return jnp.where(step < w, warm, decay)


def scale_base_lr(base_lr: float, batch_size: int, num_devices: int,
                  accumulate_grad_batches: int = 1, scale: bool = True) -> float:
    """The reference's LR scaling rule ``lr = accum * ngpu * bs * base_lr``
    (``main.py:823-831``)."""
    if not scale:
        return float(base_lr)
    return float(accumulate_grad_batches * num_devices * batch_size * base_lr)
