"""Conditional flow matching (CFM) over VAE latents — the trained model.

Re-design of ``ldm/models/diffusion/cfm1_audio.py`` (CFM), its LatentDiffusion
base (``ddpm_audio.py``), and the standalone ``CFMSampler``
(``cfm1_audio_sampler.py``), TPU-native:

  * OT flow-matching loss (``cfm1_audio.py:38-63``): sigma_min=1e-4,
    ``x_t = t*x1 + (1-(1-sigma_min)t)*x0``, target ``u_t = x1-(1-sigma_min)x0``,
    t drawn as randint(0,1000)/1000; loss = MSE + MoE load-balance loss.
  * Sampling: Euler ODE over t in [0,1] as a single ``lax.scan`` (25 steps
    default) — no torchdyn. CFG runs cond + uncond in ONE batched forward
    (batch-doubling) instead of the reference's two sequential calls
    (``cfm1_audio.py:154-162``) — halving kernel launches on the MXU.
  * ``scale_by_std`` latent rescaling (``ddpm_audio.py:89-104``) is computed
    host-side once from the first batch and stored as a plain float.

The class is a thin orchestrator: all compute is in pure jittable functions
taking explicit params/PRNG keys.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.models.schedules import (
    DiffusionSchedule, make_ddim_timesteps, make_ddim_sampling_parameters,
)
from versband_tpu.utils.config import instantiate_from_config

Array = jax.Array


def _cond_to_context(cond: Dict[str, Any]) -> Dict[str, Any]:
    """Map the dataset/embedder cond dict to the DiT context dict.

    Mirrors the hybrid branch of DiffusionWrapper (``ddpm.py:1418-1436``):
    ``{'caption': z, 'acoustic': {'acoustic','midi','beats'}, 'name': ...}`` ->
    ``{'c_crossattn': z, 'c_concat': {...}}``. Non-array entries are dropped.
    """
    acoustic = {k: v for k, v in cond["acoustic"].items()
                if not isinstance(v, (str, list))}
    return {"c_crossattn": cond["caption"], "c_concat": acoustic}


def cfm_p_losses(
    apply_fn: Callable,
    params,
    x_start: Array,
    cond: Dict[str, Any],
    t: Array,
    noise: Array,
    *,
    sigma_min: float = 1e-4,
    num_timesteps: int = 1000,
    l_simple_weight: float = 1.0,
    step: Array | int = 0,
    gumbel_rng: Optional[jax.Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """OT-CFM loss. ``x_start``: [B, C, T] latents; ``t``: int [B] in [0, 1000)."""
    x1 = x_start
    x0 = noise
    ut = x1 - (1.0 - sigma_min) * x0
    t_frac = (t.astype(jnp.float32) / num_timesteps)[:, None, None]
    x_noisy = t_frac * x1 + (1.0 - (1.0 - sigma_min) * t_frac) * x0

    rngs = {"gumbel": gumbel_rng} if gumbel_rng is not None else None
    model_out, lb_loss = apply_fn(params, x_noisy, t, _cond_to_context(cond),
                                  step=step, train=gumbel_rng is not None, rngs=rngs)
    loss_simple = jnp.mean((model_out - ut) ** 2, axis=tuple(range(1, ut.ndim)))
    loss = l_simple_weight * loss_simple.mean() + lb_loss
    return loss, {"loss_simple": loss_simple.mean(), "lb_loss": lb_loss, "loss": loss}


def _tree_concat(a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def euler_cfg_sample(
    apply_fn: Callable,
    params,
    x0: Array,
    cond: Dict[str, Any],
    uncond: Optional[Dict[str, Any]] = None,
    guidance_scale: float = 1.0,
    num_steps: int = 25,
    t_start: int = 0,
    num_timesteps: int = 1000,
    encode_once: bool = False,
) -> Array:
    """Euler ODE integration of the flow field with classifier-free guidance.

    One ``lax.scan`` over the 24 (num_steps-1) uniform steps of
    ``linspace(0,1,num_steps)``; cond and uncond are evaluated in one
    batch-doubled forward. ``x0``: [B, C, T] start noise (or partial-noise
    latent when ``t_start>0``).

    ``encode_once``: hoist the t-independent conditioning encode (midi/beats
    embedding+conv stems, caption projection) out of the scan — supported by
    backbones that answer ``{"encode_only": True}`` (BandMoeDiT). Cuts ~1/3
    of the per-step FLOPs at 25 steps.
    """
    B = x0.shape[0]
    ctx_c = _cond_to_context(cond)
    use_cfg = uncond is not None and guidance_scale != 1.0
    if use_cfg:
        ctx = _tree_concat(ctx_c, _cond_to_context(uncond))
    else:
        ctx = ctx_c
    if encode_once:
        n = 2 * B if use_cfg else B
        enc = apply_fn(params, jnp.zeros((n,) + x0.shape[1:], x0.dtype),
                       jnp.zeros((n,), jnp.float32),
                       {**ctx, "encode_only": True})
        ctx = {"c_encoded": enc}
    ts = jnp.linspace(0.0, 1.0, num_steps)[t_start:]

    def step_fn(x, i):
        t_scalar = ts[i]
        dt = ts[i + 1] - ts[i]
        # reference: torch.tensor([t*1000]*B).long() — floor to int
        t_int = jnp.floor(t_scalar * num_timesteps)
        if use_cfg:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.full((2 * B,), t_int, jnp.float32)
            v, _ = apply_fn(params, x_in, t_in, ctx)
            v_c, v_u = jnp.split(v, 2, axis=0)
            v = v_u + guidance_scale * (v_c - v_u)
        else:
            t_in = jnp.full((B,), t_int, jnp.float32)
            v, _ = apply_fn(params, x, t_in, ctx)
        return (x + dt * v).astype(x.dtype), None

    n = ts.shape[0] - 1
    x, _ = jax.lax.scan(step_fn, x0, jnp.arange(n))
    return x


class LatentDiffusion:
    """Latent generative model wrapper: frozen VAE first stage + cond stage +
    backbone. Config-compatible with ``ldm/models/diffusion/ddpm_audio.py``."""

    def __init__(
        self,
        unet_config=None,
        first_stage_config=None,
        cond_stage_config=None,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        cosine_s: float = 8e-3,
        num_timesteps_cond: int = 1,
        log_every_t: int = 200,
        first_stage_key: str = "image",
        cond_stage_key: str = "caption",
        mel_dim: int = 20,
        mel_length: int = 750,
        channels: int = 0,
        cond_stage_trainable: bool = True,
        conditioning_key: str = "hybrid",
        monitor: Optional[str] = None,
        scale_by_std: bool = True,
        scale_factor: float = 1.0,
        use_ema: bool = False,
        scheduler_config=None,
        l_simple_weight: float = 1.0,
        base_learning_rate: Optional[float] = None,
        dtype=jnp.float32,
        **kwargs,
    ):
        self.schedule = DiffusionSchedule.create(
            timesteps, beta_schedule, linear_start, linear_end, cosine_s)
        self.num_timesteps = timesteps
        self.mel_dim = mel_dim
        self.mel_length = mel_length
        self.channels = channels
        self.first_stage_key = first_stage_key
        self.cond_stage_key = cond_stage_key
        self.cond_stage_trainable = cond_stage_trainable
        self.conditioning_key = conditioning_key
        self.scale_by_std = scale_by_std
        self.scale_factor = float(scale_factor)
        self.use_ema = use_ema
        self.monitor = monitor
        self.scheduler_config = scheduler_config
        self.l_simple_weight = l_simple_weight
        self.dtype = dtype

        self.model = instantiate_from_config(unet_config) if unet_config else None
        self.first_stage = (instantiate_from_config(first_stage_config)
                            if first_stage_config else None)
        self.cond_stage = None
        if cond_stage_config and cond_stage_config != "__is_unconditional__":
            try:
                self.cond_stage = instantiate_from_config(cond_stage_config)
            except Exception:
                # cond stage (e.g. T5 weights) may be unavailable in test envs;
                # callers can pass pre-encoded conditions instead.
                self.cond_stage = None

    # --- model forward -----------------------------------------------------
    def apply_model(self, params, x_noisy: Array, t: Array, cond: Dict[str, Any],
                    step=0, train: bool = False, rngs=None) -> Tuple[Array, Array]:
        return self.model.apply(params, x_noisy, t, _cond_to_context(cond),
                                step=step, train=train, rngs=rngs)

    # --- first stage -------------------------------------------------------
    def encode_first_stage(self, vae_params, mel: Array, key: Optional[jax.Array] = None,
                           sample: bool = True) -> Array:
        """[B, 80, T] mel -> scaled latent [B, 20, T/2]."""
        post = self.first_stage.apply(vae_params, mel, method="encode")
        z = post.sample(key) if (sample and key is not None) else post.mode()
        return self.scale_factor * z

    def decode_first_stage(self, vae_params, z: Array) -> Array:
        return self.first_stage.apply(vae_params, z / self.scale_factor, method="decode")

    def compute_scale_factor(self, vae_params, mel: Array, key: jax.Array) -> float:
        """scale_by_std: 1/std(z) of the first batch (``ddpm_audio.py:89-104``)."""
        post = self.first_stage.apply(vae_params, mel, method="encode")
        z = post.sample(key)
        self.scale_factor = float(1.0 / np.asarray(z.std()))
        return self.scale_factor

    # --- cond stage ---------------------------------------------------------
    def get_learned_conditioning(self, cond_params, cond: Dict[str, Any]) -> Dict[str, Any]:
        if self.cond_stage is None:
            return cond
        # embedders are frozen host-side towers carrying their own params
        # (__call__(cond)); cond_params is kept for signature compatibility
        return self.cond_stage(cond)

    # --- losses -------------------------------------------------------------
    def get_loss(self, pred: Array, target: Array) -> Array:
        return (pred - target) ** 2

    def latent_length(self, cond_length: int) -> int:
        """ceil(T_cond/2): latent frames for a conditioning of T mel frames
        (``cfm1_audio.py:98``, ``test_final.py:389``)."""
        return math.ceil(cond_length / 2)


class CFM(LatentDiffusion):
    """Flow-matching latent model (``cfm1_audio.py:31-130``)."""

    sigma_min: float = 1e-4

    def p_losses(self, params, x_start: Array, cond: Dict[str, Any], t: Array,
                 key: jax.Array, step=0, train: bool = True,
                 noise: Optional[Array] = None) -> Tuple[Array, Dict[str, Array]]:
        k_noise, k_gumbel = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        return cfm_p_losses(
            self.model.apply, params, x_start, cond, t, noise,
            sigma_min=self.sigma_min, num_timesteps=self.num_timesteps,
            l_simple_weight=self.l_simple_weight, step=step,
            gumbel_rng=k_gumbel if train else None,
        )

    def training_losses(self, params, x_start: Array, cond: Dict[str, Any],
                        key: jax.Array, step=0) -> Tuple[Array, Dict[str, Array]]:
        """Draw t ~ randint(0, num_timesteps) and compute the CFM loss."""
        k_t, k_rest = jax.random.split(key)
        t = jax.random.randint(k_t, (x_start.shape[0],), 0, self.num_timesteps)
        return self.p_losses(params, x_start, cond, t, k_rest, step=step)

    def sample_cfg(self, params, cond: Dict[str, Any], guidance_scale: float,
                   uncond: Optional[Dict[str, Any]], key: jax.Array,
                   batch_size: Optional[int] = None, timesteps: Optional[int] = None,
                   shape: Optional[Tuple[int, ...]] = None,
                   x_latent: Optional[Array] = None, t_start: int = 0) -> Array:
        """CFG Euler sampling. Latent length derives from the acoustic cond
        (``cfm1_audio.py:92-116``)."""
        steps = 25 if timesteps is None else timesteps
        if shape is None:
            # the shipped cond dict may carry only midi/beats (the model
            # derives 'acoustic' from them) — any entry fixes B and T_cond
            ac = cond["acoustic"]
            ref = next(ac[k] for k in ("acoustic", "midi", "beats")
                       if ac.get(k) is not None)
            T_cond = ref.shape[2]
            B = batch_size or ref.shape[0]
            shape = (B, self.mel_dim, self.latent_length(T_cond))
        x0 = (jax.random.normal(key, shape, jnp.float32)
              if x_latent is None else x_latent)
        from versband_tpu.models.dit import BandMoeDiT

        return euler_cfg_sample(
            self.model.apply, params, x0, cond, uncond, guidance_scale,
            num_steps=steps, t_start=t_start, num_timesteps=self.num_timesteps,
            encode_once=isinstance(self.model, BandMoeDiT))

    def sample(self, params, cond, key, **kw) -> Array:
        return self.sample_cfg(params, cond, 1.0, None, key, **kw)

    def stochastic_encode(self, x0: Array, t_index: Array, key: jax.Array,
                          ddim_steps: int = 25,
                          noise: Optional[Array] = None) -> Array:
        """Partial-noise start for img2img-style sampling (``cfm1_audio.py:123-130``)."""
        ddim_ts = make_ddim_timesteps("uniform", ddim_steps, self.num_timesteps)
        _, ddim_alphas, _ = make_ddim_sampling_parameters(
            self.schedule.alphas_cumprod, ddim_ts, eta=0.0)
        sqrt_a = jnp.sqrt(jnp.asarray(ddim_alphas))
        sqrt_1ma = jnp.sqrt(1.0 - jnp.asarray(ddim_alphas))
        if noise is None:
            noise = jax.random.normal(key, x0.shape, x0.dtype)
        return sqrt_a[t_index] * x0 + sqrt_1ma[t_index] * noise


class CFMSampler:
    """Standalone inference sampler mirroring ``cfm1_audio_sampler.py:26-120``."""

    def __init__(self, model: CFM, num_timesteps: int = 25):
        self.model = model
        self.num_timesteps = num_timesteps

    def sample_cfg(self, params, cond, guidance_scale, uncond, key,
                   batch_size=None, shape=None, x_latent=None, t_start: int = 0):
        return self.model.sample_cfg(
            params, cond, guidance_scale, uncond, key, batch_size=batch_size,
            timesteps=self.num_timesteps, shape=shape, x_latent=x_latent,
            t_start=t_start)
