"""Classic diffusion samplers over the DDPM schedule buffers.

Re-designs of ``ldm/models/diffusion/{ddim.py,plms.py}`` and the ancestral
loop of ``ddpm.py:489-725`` / ``ddpm_audio.py:489-725``, as ``lax.scan``
programs over host-precomputed numpy schedule tables:

  * ``q_sample`` / eps<->x0 conversions (``ddpm.py:234-289``);
  * ``ddpm_sample_loop`` — ancestral sampling with optional clipping;
  * ``DDIMSampler``  — ``make_schedule`` + scanned ``p_sample_ddim`` with
    batch-doubled CFG (the reference runs cond/uncond separately,
    ``ddim.py:150-172``) and eta-controlled stochasticity, plus
    ``stochastic_encode``/``decode`` for img2img starts;
  * ``PLMSSampler``  — pseudo linear multistep (``plms.py:11-236``): the
    order-ramp first step (Euler + midpoint correction) runs un-scanned, the
    steady-state 4th-order Adams-Bashforth body is one scan with a [3, ...]
    eps ring buffer.

Model signature everywhere: ``apply_fn(params, x, t, context) -> (eps, aux)``
(parameterization 'eps'; 'x0' converts internally).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.models.schedules import (
    DiffusionSchedule, make_ddim_sampling_parameters, make_ddim_timesteps)

Array = jax.Array


def _extract(table: Array, t: Array, ndim: int) -> Array:
    out = jnp.asarray(table)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(schedule: DiffusionSchedule, x_start: Array, t: Array,
             noise: Array) -> Array:
    """x_t = sqrt(ac_t) x0 + sqrt(1-ac_t) eps (``ddpm.py:281-289``)."""
    return (_extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise)


def predict_start_from_noise(schedule: DiffusionSchedule, x_t: Array, t: Array,
                             noise: Array) -> Array:
    return (_extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
            * noise)


def q_posterior(schedule: DiffusionSchedule, x_start: Array, x_t: Array,
                t: Array) -> Tuple[Array, Array, Array]:
    mean = (_extract(schedule.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(schedule.posterior_mean_coef2, t, x_t.ndim) * x_t)
    var = _extract(schedule.posterior_variance, t, x_t.ndim)
    log_var = _extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


def ddpm_p_losses(apply_fn: Callable, params, schedule: DiffusionSchedule,
                  x_start: Array, t: Array, context, noise: Array,
                  parameterization: str = "eps", loss_type: str = "l2",
                  l_simple_weight: float = 1.0,
                  original_elbo_weight: float = 0.0) -> Tuple[Array, dict]:
    """Classic DDPM training loss (``ddpm.py:290-340``): q_sample then predict
    eps (or x0), simple MSE/L1 + optional VLB term weighted by
    posterior-variance coefficients."""
    x_noisy = q_sample(schedule, x_start, t, noise)
    out, _ = apply_fn(params, x_noisy, t.astype(jnp.float32), context)
    target = noise if parameterization == "eps" else x_start
    err = (out - target) ** 2 if loss_type == "l2" else jnp.abs(out - target)
    loss_simple = err.mean(axis=tuple(range(1, err.ndim)))
    # lvlb weights (ddpm.py:160-167): eps-param variance weighting
    betas = jnp.asarray(schedule.betas)
    ac = jnp.asarray(schedule.alphas_cumprod)
    pv = jnp.asarray(schedule.posterior_variance)
    lvlb_w = betas ** 2 / (2 * pv * (1.0 - betas) * (1.0 - ac))
    lvlb_w = lvlb_w.at[0].set(lvlb_w[1])
    loss_vlb = (lvlb_w[t] * loss_simple).mean()
    loss = l_simple_weight * loss_simple.mean() \
        + original_elbo_weight * loss_vlb
    return loss, {"loss_simple": loss_simple.mean(), "loss_vlb": loss_vlb,
                  "loss": loss}


def ddpm_sample_loop(apply_fn: Callable, params, schedule: DiffusionSchedule,
                     shape: Tuple[int, ...], context, key: jax.Array,
                     parameterization: str = "eps",
                     clip_denoised: bool = True) -> Array:
    """Ancestral sampling from T-1 down to 0 (``ddpm.py:489-530``)."""
    B = shape[0]
    k_init, k_loop = jax.random.split(key)
    x_T = jax.random.normal(k_init, shape)

    def body(x, step):
        t = jnp.full((B,), step, jnp.int32)
        out, _ = apply_fn(params, x, t.astype(jnp.float32), context)
        if parameterization == "eps":
            x0 = predict_start_from_noise(schedule, x, t, out)
        else:
            x0 = out
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, _, log_var = q_posterior(schedule, x0, x, t)
        noise = jax.random.normal(jax.random.fold_in(k_loop, step), x.shape)
        mask = (step > 0).astype(x.dtype)
        return mean + mask * jnp.exp(0.5 * log_var) * noise, None

    steps = jnp.arange(schedule.num_timesteps - 1, -1, -1)
    x, _ = jax.lax.scan(body, x_T, steps)
    return x


def _cfg_eps(apply_fn, params, x, t_vec, context, uncond_context, scale):
    """Batch-doubled classifier-free guidance model call (one fused forward
    instead of the reference's two sequential calls, ``ddim.py:150-160``)."""
    if uncond_context is None or scale == 1.0:
        eps, _ = apply_fn(params, x, t_vec, context)
        return eps
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t_vec, t_vec], axis=0)
    ctx2 = jax.tree_util.tree_map(
        lambda c, u: jnp.concatenate([c, u], axis=0), context, uncond_context)
    eps2, _ = apply_fn(params, x2, t2, ctx2)
    eps_c, eps_u = jnp.split(eps2, 2, axis=0)
    return eps_u + scale * (eps_c - eps_u)


class DDIMSampler:
    """``ldm/models/diffusion/ddim.py:25-233`` on numpy schedule tables."""

    def __init__(self, model_apply: Callable, schedule: DiffusionSchedule):
        self.apply_fn = model_apply
        self.schedule = schedule

    def make_schedule(self, ddim_num_steps: int, ddim_discretize: str = "uniform",
                      ddim_eta: float = 0.0):
        ts = make_ddim_timesteps(ddim_discretize, ddim_num_steps,
                                 self.schedule.num_timesteps)
        ts = np.minimum(ts, self.schedule.num_timesteps - 1)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            self.schedule.alphas_cumprod, ts, ddim_eta)
        return ts, sigmas, alphas, alphas_prev

    def sample(self, params, shape: Tuple[int, ...], context, key: jax.Array,
               S: int = 50, eta: float = 0.0,
               unconditional_guidance_scale: float = 1.0,
               unconditional_conditioning=None, x_T: Optional[Array] = None,
               clip_denoised: bool = False) -> Array:
        ts, sigmas, alphas, alphas_prev = self.make_schedule(S, ddim_eta=eta)
        B = shape[0]
        k_init, k_loop = jax.random.split(key)
        x = x_T if x_T is not None else jax.random.normal(k_init, shape)

        ts_j = jnp.asarray(ts)
        al_j, alp_j, sig_j = map(jnp.asarray, (alphas, alphas_prev, sigmas))

        def body(x, i):
            # reversed index: i runs S-1 .. 0
            t_vec = jnp.full((B,), ts_j[i], jnp.float32)
            eps = _cfg_eps(self.apply_fn, params, x, t_vec, context,
                           unconditional_conditioning,
                           unconditional_guidance_scale)
            a_t = al_j[i]
            a_prev = alp_j[i]
            sigma_t = sig_j[i]
            pred_x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            if clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t ** 2, 0.0)) * eps
            noise = sigma_t * jax.random.normal(
                jax.random.fold_in(k_loop, i), x.shape)
            return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise, None

        x, _ = jax.lax.scan(body, x, jnp.arange(len(ts) - 1, -1, -1))
        return x

    def stochastic_encode(self, x0: Array, t_index: int, key: jax.Array,
                          ddim_num_steps: int = 50,
                          noise: Optional[Array] = None) -> Array:
        ts, _, alphas, _ = self.make_schedule(ddim_num_steps)
        if noise is None:
            noise = jax.random.normal(key, x0.shape, x0.dtype)
        a = jnp.asarray(alphas)[t_index]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def decode(self, params, x_latent: Array, context, t_start: int,
               key: jax.Array, S: int = 50,
               unconditional_guidance_scale: float = 1.0,
               unconditional_conditioning=None) -> Array:
        """Continue DDIM from an encoded latent (``ddim.py:196-233``)."""
        ts, sigmas, alphas, alphas_prev = self.make_schedule(S)
        B = x_latent.shape[0]
        ts_j = jnp.asarray(ts)
        al_j, alp_j = jnp.asarray(alphas), jnp.asarray(alphas_prev)

        def body(x, i):
            t_vec = jnp.full((B,), ts_j[i], jnp.float32)
            eps = _cfg_eps(self.apply_fn, params, x, t_vec, context,
                           unconditional_conditioning,
                           unconditional_guidance_scale)
            a_t, a_prev = al_j[i], alp_j[i]
            pred_x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * eps
            return jnp.sqrt(a_prev) * pred_x0 + dir_xt, None

        x, _ = jax.lax.scan(body, x_latent, jnp.arange(t_start - 1, -1, -1))
        return x


class PLMSSampler:
    """Pseudo linear multistep sampler (``plms.py:11-236``)."""

    def __init__(self, model_apply: Callable, schedule: DiffusionSchedule):
        self.apply_fn = model_apply
        self.schedule = schedule

    def sample(self, params, shape: Tuple[int, ...], context, key: jax.Array,
               S: int = 50, unconditional_guidance_scale: float = 1.0,
               unconditional_conditioning=None,
               x_T: Optional[Array] = None) -> Array:
        ts = make_ddim_timesteps("uniform", S, self.schedule.num_timesteps)
        ts = np.minimum(ts, self.schedule.num_timesteps - 1)
        _, alphas, alphas_prev = make_ddim_sampling_parameters(
            self.schedule.alphas_cumprod, ts, eta=0.0)
        B = shape[0]
        x = x_T if x_T is not None else jax.random.normal(key, shape)

        al = jnp.asarray(alphas)
        alp = jnp.asarray(alphas_prev)
        ts_j = jnp.asarray(ts)

        def eps_at(x, i):
            t_vec = jnp.full((B,), ts_j[i], jnp.float32)
            return _cfg_eps(self.apply_fn, params, x, t_vec, context,
                            unconditional_conditioning,
                            unconditional_guidance_scale)

        def x_prev_from(x, e, i):
            a_t, a_prev = al[i], alp[i]
            pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e
            return jnp.sqrt(a_prev) * pred_x0 + dir_xt

        n = len(ts)
        # --- warm-up steps (orders 1..3), un-scanned ---------------------
        old_eps = []
        idx = n - 1
        for k in range(min(3, n)):
            e_t = eps_at(x, idx)
            if k == 0:
                # 2nd-order start: Euler step then midpoint eps average
                x_e = x_prev_from(x, e_t, idx)
                i_next = max(idx - 1, 0)
                e_next = eps_at(x_e, i_next)
                e_prime = 0.5 * (e_t + e_next)
            elif k == 1:
                e_prime = (3.0 * e_t - old_eps[-1]) / 2.0
            else:
                e_prime = (23.0 * e_t - 16.0 * old_eps[-1]
                           + 5.0 * old_eps[-2]) / 12.0
            x = x_prev_from(x, e_prime, idx)
            old_eps.append(e_t)
            idx -= 1
            if idx < 0:
                return x

        # --- steady state: 4th-order Adams-Bashforth scan ----------------
        ring = jnp.stack(old_eps[-3:])  # [3, ...] newest last

        def body(carry, i):
            x, ring = carry
            e_t = eps_at(x, i)
            e_prime = (55.0 * e_t - 59.0 * ring[2] + 37.0 * ring[1]
                       - 9.0 * ring[0]) / 24.0
            x = x_prev_from(x, e_prime, i)
            ring = jnp.concatenate([ring[1:], e_t[None]], axis=0)
            return (x, ring), None

        (x, _), _ = jax.lax.scan(body, (x, ring), jnp.arange(idx, -1, -1))
        return x
