"""DDIM/PLMS/ancestral samplers: schedule math vs analytic identities,
sampling a known Gaussian toy score model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.samplers import (
    DDIMSampler, PLMSSampler, ddpm_sample_loop, q_sample,
    predict_start_from_noise)
from versband_tpu.models.schedules import DiffusionSchedule


@pytest.fixture(scope="module")
def schedule():
    return DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)


def test_q_sample_roundtrip(schedule):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 8))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([100, 700])
    xt = q_sample(schedule, x0, t, noise)
    rec = predict_start_from_noise(schedule, xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def _toy_eps_model(mu):
    """Data = delta at mu: true eps(x_t, t) = (x_t - sqrt(ac_t) mu)/sqrt(1-ac_t)."""
    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
    sac = jnp.asarray(sched.sqrt_alphas_cumprod)
    s1m = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def apply_fn(params, x, t, context):
        ti = t.astype(jnp.int32)
        a = sac[ti].reshape(-1, 1, 1)
        b = s1m[ti].reshape(-1, 1, 1)
        return (x - a * mu) / b, 0.0

    return apply_fn, sched


def test_ddim_converges_to_data_point():
    mu = 0.7
    apply_fn, sched = _toy_eps_model(mu)
    sampler = DDIMSampler(apply_fn, sched)
    x = sampler.sample(None, (2, 3, 8), None, jax.random.PRNGKey(0), S=50)
    np.testing.assert_allclose(np.asarray(x), mu, atol=0.1)


def test_ddim_eta_stochastic_still_converges():
    mu = -0.4
    apply_fn, sched = _toy_eps_model(mu)
    sampler = DDIMSampler(apply_fn, sched)
    x = sampler.sample(None, (1, 2, 8), None, jax.random.PRNGKey(1), S=50,
                       eta=1.0)
    np.testing.assert_allclose(np.asarray(x), mu, atol=0.15)


def test_plms_converges_to_data_point():
    mu = 0.3
    apply_fn, sched = _toy_eps_model(mu)
    sampler = PLMSSampler(apply_fn, sched)
    x = sampler.sample(None, (1, 3, 8), None, jax.random.PRNGKey(2), S=50)
    np.testing.assert_allclose(np.asarray(x), mu, atol=0.1)


def test_ancestral_loop_converges():
    mu = 0.5
    apply_fn, sched = _toy_eps_model(mu)
    x = ddpm_sample_loop(apply_fn, None, sched, (1, 2, 8), None,
                         jax.random.PRNGKey(3), clip_denoised=True)
    np.testing.assert_allclose(np.asarray(x), mu, atol=0.2)


def test_ddim_stochastic_encode_decode():
    mu = 0.2
    apply_fn, sched = _toy_eps_model(mu)
    sampler = DDIMSampler(apply_fn, sched)
    x0 = jnp.full((1, 2, 8), mu)
    enc = sampler.stochastic_encode(x0, 25, jax.random.PRNGKey(4),
                                    ddim_num_steps=50)
    dec = sampler.decode(None, enc, None, 25, jax.random.PRNGKey(5), S=50)
    np.testing.assert_allclose(np.asarray(dec), mu, atol=0.1)


def test_cfg_batch_doubling_path(schedule):
    # context pytree gets concatenated; scale != 1 must not change a toy model
    # that ignores context
    mu = 0.1
    apply_fn, sched = _toy_eps_model(mu)
    sampler = DDIMSampler(apply_fn, sched)
    ctx = {"c": jnp.zeros((1, 4))}
    x = sampler.sample(None, (1, 2, 8), ctx, jax.random.PRNGKey(6), S=25,
                       unconditional_guidance_scale=3.0,
                       unconditional_conditioning={"c": jnp.ones((1, 4))})
    np.testing.assert_allclose(np.asarray(x), mu, atol=0.1)


def test_ddpm_p_losses_eps_and_x0(schedule):
    from versband_tpu.models.samplers import ddpm_p_losses

    def zero_model(params, x, t, ctx):
        return jnp.zeros_like(x), 0.0

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 3, 8))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([10, 500])
    # eps-param with a zero model: loss_simple == mean(noise^2) per item
    loss, parts = ddpm_p_losses(zero_model, None, schedule, x0, t, None, noise)
    expect = float((noise ** 2).mean())
    np.testing.assert_allclose(float(parts["loss_simple"]), expect, rtol=1e-5)
    # x0-param: loss_simple == mean(x0^2)
    loss2, parts2 = ddpm_p_losses(zero_model, None, schedule, x0, t, None,
                                  noise, parameterization="x0")
    np.testing.assert_allclose(float(parts2["loss_simple"]),
                               float((x0 ** 2).mean()), rtol=1e-5)
    # elbo weighting finite
    loss3, parts3 = ddpm_p_losses(zero_model, None, schedule, x0, t, None,
                                  noise, original_elbo_weight=0.1)
    assert np.isfinite(float(parts3["loss_vlb"]))
