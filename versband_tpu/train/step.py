"""Jittable train steps — single-chip and mesh-sharded (pjit) variants.

The TPU-native replacement for the Lightning ``training_step`` dispatch
(``ddpm.py:341-355``, ``ddpm_audio.py:418-441``): a pure function
``(state, batch, key) -> (state, metrics)`` compiled once; under a mesh the
same function is jitted with sharded in/out specs and XLA inserts the DP
gradient all-reduce plus TP/EP collectives (see versband_tpu.parallel).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from versband_tpu.models.cfm import CFM
from versband_tpu.parallel.sharding import (
    batch_shardings, param_shardings, replicated)
from versband_tpu.train.state import TrainState


def _decompress_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Widen wire-compressed inputs back to compute dtypes.

    The trainer may ship mels as fp16 and midi/beats ids as int16 to halve
    host->device bytes (``CFMTrainer(transfer_dtype=...)``); XLA fuses these
    converts into the first consumers, so the cast is free on fp32 input and
    a pure bandwidth win on fp16. No-op for uncompressed batches.
    """
    def widen(v):
        if hasattr(v, "dtype"):
            if v.dtype == jnp.float16:
                return v.astype(jnp.float32)
            if v.dtype == jnp.int16:
                return v.astype(jnp.int32)
        return v

    return {k: widen(v) for k, v in batch.items()}


def make_cfm_train_step(cfm: CFM, vae_params: Optional[Any] = None,
                        accumulate_grad_batches: int = 1,
                        ) -> Callable[..., Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the CFM train step.

    ``batch``: {'image': mel [B,80,T] (if a frozen VAE is attached) or
    'latent': [B,C,T_lat], 'caption': text embedding [B,Ty,E],
    'midi': [B,1,T], 'beats': [B,1,T]}.

    The frozen VAE params are passed to the returned step as a jit ARGUMENT
    (falling back to the ones bound here) — closing over the full-size VAE
    would bake ~100M constants into the HLO (and overflow remote-compile
    upload limits).

    With gradient accumulation the optimizer is an ``optax.MultiSteps`` that
    applies every k micro-steps; ``state.step`` counts micro-steps (so RNG
    folding stays unique per batch) while the MoE annealing schedules see
    ``step // k`` — the reference's schedules tick per OPTIMIZER step
    (Lightning ``global_step``, ``main.py:823-831``).
    """
    bound_vae_params = vae_params
    accum = max(1, int(accumulate_grad_batches))

    def step_fn(state: TrainState, batch: Dict[str, Any], key: jax.Array,
                vae_params: Optional[Any] = None):
        vae_params = vae_params if vae_params is not None else bound_vae_params
        batch = _decompress_batch(batch)
        key = jax.random.fold_in(key, state.step)
        k_enc, k_t, k_loss = jax.random.split(key, 3)

        if vae_params is not None and "image" in batch:
            x_start = cfm.encode_first_stage(vae_params, batch["image"], k_enc)
        else:
            x_start = batch["latent"]
        cond = {
            "caption": batch["caption"],
            "acoustic": {k: batch[k] for k in ("acoustic", "midi", "beats")
                         if k in batch},
        }
        t = jax.random.randint(k_t, (x_start.shape[0],), 0, cfm.num_timesteps)

        def loss_fn(params):
            return cfm.p_losses(params, x_start, cond, t, k_loss,
                                step=state.step // accum)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


def make_cfm_multi_step(cfm: CFM, accumulate_grad_batches: int = 1,
                        ) -> Callable[..., Tuple[TrainState, Dict[str, jax.Array]]]:
    """K chained train steps fused into ONE program via ``lax.scan``.

    ``batches``: the single-step batch pytree with a leading [K, ...] axis
    (host-stacked). Per-program dispatch overhead (RPC latency on a tunneled
    device, driver launch latency anywhere) is paid once per K steps instead
    of per step — the TPU-native analogue of Lightning's tight step loop.
    Metrics come back stacked [K]. RNG stays per-micro-step unique because
    ``step_fn`` folds the key with ``state.step``, which advances inside the
    scan.
    """
    step_fn = make_cfm_train_step(
        cfm, accumulate_grad_batches=accumulate_grad_batches)

    def multi_fn(state: TrainState, batches: Dict[str, Any], key: jax.Array,
                 vae_params: Optional[Any] = None):
        def body(st, b):
            return step_fn(st, b, key, vae_params)

        return jax.lax.scan(body, state, batches)

    return multi_fn


def shard_train_step(step_fn: Callable, state: TrainState, batch_example: Any,
                     mesh: Mesh):
    """Jit a train step over a mesh: params by rule, batch over 'data'.

    Returns ``(jitted_step, place_state, place_batch)`` where the placers move
    host arrays onto the mesh with the right shardings.
    """
    p_shard = param_shardings(state.params, mesh)
    rep = replicated(mesh)

    # optax states embed param-STRUCTURED pytrees (Adam moments mirror the
    # param tree), so match whole subtrees against the param treedef and give
    # each moment exactly its param's sharding; everything else replicates.
    # (Shape-keyed matching would mis-shard same-shaped params with different
    # specs, e.g. a square wq P(None,'model') vs wo P('model',None).)
    param_treedef = jax.tree_util.tree_structure(state.params)

    def _is_param_tree(x):
        try:
            return jax.tree_util.tree_structure(x) == param_treedef
        except Exception:
            return False

    opt_shardings = jax.tree_util.tree_map(
        lambda sub: p_shard if _is_param_tree(sub) else rep,
        state.opt_state, is_leaf=_is_param_tree)

    st_shardings = TrainState(
        step=rep,
        params=p_shard,
        opt_state=opt_shardings,
        tx=state.tx,
        ema=None if state.ema is None else state.ema.replace(
            num_updates=rep, shadow=p_shard),
    )
    b_shardings = batch_shardings(batch_example, mesh)

    # Donating the state halves peak HBM on TPU; on the CPU backend donation +
    # in-process collectives deadlocks the thunk rendezvous (observed on the
    # 8-device virtual mesh), so donate only on real hardware.
    donate = (0,) if jax.default_backend() == "tpu" else ()

    def step_with_vae(state, batch, key, vae_params=None):
        return step_fn(state, batch, key, vae_params)

    jitted = jax.jit(
        step_with_vae,
        in_shardings=(st_shardings, b_shardings, rep, rep),
        out_shardings=(st_shardings, rep),
        donate_argnums=donate,
    )

    def place_state(s):
        return jax.device_put(s, st_shardings)

    def place_batch(b):
        return jax.device_put(b, b_shardings)

    return jitted, place_state, place_batch
