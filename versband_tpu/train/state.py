"""Train state containers: params + optimizer + EMA shadow, as pytrees.

The TPU-native replacement for Lightning module state and ``LitEma``
(``ldm/modules/ema.py:5-76``): EMA is a plain shadow pytree updated with the
same warm-up decay rule ``min(decay, (1+n)/(10+n))``, carried inside the jitted
train step instead of name-mangled module buffers.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class EmaState:
    """EMA shadow params with update counting (``ema.py:5-41``)."""

    decay: float = struct.field(pytree_node=False)
    num_updates: jax.Array = None
    shadow: Any = None

    @classmethod
    def create(cls, params, decay: float = 0.9999, use_num_updates: bool = True):
        return cls(decay=decay,
                   num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
                   shadow=jax.tree_util.tree_map(jnp.asarray, params))

    def update(self, params) -> "EmaState":
        n = self.num_updates + (self.num_updates >= 0).astype(jnp.int32)
        decay = jnp.where(
            n >= 0,
            jnp.minimum(self.decay, (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32))),
            self.decay)
        one_minus = 1.0 - decay
        shadow = jax.tree_util.tree_map(
            lambda s, p: s - one_minus * (s - p.astype(s.dtype)), self.shadow, params)
        return self.replace(num_updates=n, shadow=shadow)

    def copy_to(self, params):
        """Return the shadow cast to the params' dtypes — the LitEma
        ``copy_to`` used for EMA-weights validation (``ema.py:44-50``)."""
        return jax.tree_util.tree_map(
            lambda p, s: s.astype(p.dtype), params, self.shadow)


@contextlib.contextmanager
def ema_scope(state: "TrainState"):
    """Yield EMA weights for evaluation, mirroring LitEma's store/restore
    context (``ema.py:52-76``; functional — nothing to restore)."""
    if state.ema is not None:
        yield state.ema.copy_to(state.params)
    else:
        yield state.params


@struct.dataclass
class TrainState:
    """Single-optimizer train state (CFM). GAN training uses two of these."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema: Optional[EmaState] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               ema_decay: Optional[float] = None):
        ema = EmaState.create(params, ema_decay) if ema_decay is not None else None
        return cls(step=jnp.asarray(0, jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, ema=ema)

    def apply_gradients(self, grads) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema = self.ema
        if ema is not None:
            mini_step = getattr(opt_state, "mini_step", None)
            if mini_step is None:
                ema = ema.update(params)
            else:
                # Under optax.MultiSteps (gradient accumulation) the shadow
                # moves only on micro-steps where the accumulated update is
                # actually applied — Lightning updates EMA once per OPTIMIZER
                # step (``ddpm.py:366-368``), not per micro-batch.
                ema = jax.lax.cond(mini_step == 0,
                                   lambda e: e.update(params),
                                   lambda e: e, ema)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state, ema=ema)


def make_adamw(learning_rate: float | Callable, betas=(0.9, 0.999),
               weight_decay: float = 0.0, eps: float = 1e-8,
               grad_clip: Optional[float] = None,
               accumulate_grad_batches: int = 1) -> optax.GradientTransformation:
    """AdamW + optional global-norm clipping (the reference uses
    ``torch.optim.AdamW`` with Lightning ``gradient_clip_val`` = 1.0,
    ``configs/vocal2music.yaml:94``). ``accumulate_grad_batches`` maps the
    Lightning accumulation setting onto ``optax.MultiSteps``."""
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                             weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


def make_radam(learning_rate: float | Callable, betas=(0.9, 0.999),
               eps: float = 1e-8,
               weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam — the ParallelWaveGAN trainer's optimizer
    (``vocoder/parallel_wavegan/optimizers/radam.py``).

    The reference applies classic L2 regularization — decay is added to the
    GRADIENT before the adaptive update (``radam.py`` ``p.data`` term inside
    step) — so the decay transform goes BEFORE radam, not after (decoupled
    AdamW-style decay would follow a different trajectory)."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.radam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
    return optax.chain(*chain) if len(chain) > 1 else chain[0]


def make_adam(learning_rate: float | Callable, betas=(0.5, 0.9),
              eps: float = 1e-8,
              accumulate_grad_batches: int = 1) -> optax.GradientTransformation:
    """Adam with GAN betas (0.5, 0.9) for the VAE/discriminator pair
    (``autoencoder1d.py:137-146``)."""
    tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx
