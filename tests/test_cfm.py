"""Tests for the CFM flow-matching core and Euler CFG sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.cfm import CFM, euler_cfg_sample, cfm_p_losses
from versband_tpu.models.dit import BandMoeDiT

TINY_UNET = {
    "target": "versband_tpu.models.dit.BandMoeDiT",
    "params": dict(in_channels=6, context_dim=16, hidden_size=16, depth=1,
                   num_heads=2, max_len=32, num_experts=2, ori_dim=12,
                   multiple_of=8),
}


def _cond(B=2, T_mel=16, Ty=4):
    key = jax.random.PRNGKey(0)
    return {
        "caption": jax.random.normal(key, (B, Ty, 12)),
        "acoustic": {
            "acoustic": jnp.zeros((B, 20, T_mel)),
            "midi": jax.random.randint(key, (B, 1, T_mel), 0, 130),
            "beats": jax.random.randint(key, (B, 1, T_mel), 0, 3),
        },
        "name": ["a", "b"],
    }


@pytest.fixture(scope="module")
def cfm():
    m = CFM(unet_config=TINY_UNET, mel_dim=6)
    B, T_lat = 2, 8
    x = jnp.zeros((B, 6, T_lat))
    t = jnp.zeros((B,), jnp.int32)
    from versband_tpu.models.cfm import _cond_to_context
    params = m.model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, t, _cond_to_context(_cond()))
    return m, params


@pytest.mark.slow
def test_cfm_loss_finite_and_interp(cfm):
    m, params = cfm
    x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
    loss, ld = m.training_losses(params, x1, _cond(), jax.random.PRNGKey(3), step=0)
    assert np.isfinite(float(loss))
    assert set(ld) == {"loss_simple", "lb_loss", "loss"}
    # at init model output is 0 (adaLN-zero) so loss_simple == E|ut|^2
    t = jnp.asarray([0, 0])
    noise = jax.random.normal(jax.random.PRNGKey(4), x1.shape)
    _, ld0 = m.p_losses(params, x1, _cond(), t, jax.random.PRNGKey(5),
                        train=False, noise=noise)
    ut = x1 - (1 - 1e-4) * noise
    np.testing.assert_allclose(float(ld0["loss_simple"]), float(jnp.mean(ut**2)), rtol=1e-5)


def test_euler_sampler_shapes(cfm):
    m, params = cfm
    cond = _cond()
    out = m.sample_cfg(params, cond, 2.0, _cond(), jax.random.PRNGKey(6), timesteps=5)
    # latent length = ceil(16/2) = 8
    assert out.shape == (2, 6, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_batch_doubling_equals_two_pass(cfm):
    """One batch-doubled CFG forward == reference's two sequential calls."""
    m, params = cfm
    cond, uncond = _cond(), _cond()
    uncond["caption"] = jnp.zeros_like(uncond["caption"])
    x0 = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 8))
    scale = 3.0
    fused = euler_cfg_sample(m.model.apply, params, x0, cond, uncond, scale, num_steps=4)

    # manual two-pass euler
    from versband_tpu.models.cfm import _cond_to_context
    ts = np.linspace(0, 1, 4)
    x = x0
    for i in range(3):
        t_int = jnp.full((2,), float(np.floor(ts[i] * 1000)))
        v_c, _ = m.model.apply(params, x, t_int, _cond_to_context(cond))
        v_u, _ = m.model.apply(params, x, t_int, _cond_to_context(uncond))
        v = v_u + scale * (v_c - v_u)
        x = x + (ts[i + 1] - ts[i]) * v
    np.testing.assert_allclose(np.asarray(fused), np.asarray(x), atol=1e-4)


@pytest.mark.slow
def test_scale_guidance_one_skips_uncond(cfm):
    m, params = cfm
    x0 = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 8))
    a = euler_cfg_sample(m.model.apply, params, x0, _cond(), None, 1.0, num_steps=3)
    b = euler_cfg_sample(m.model.apply, params, x0, _cond(), _cond(), 1.0, num_steps=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stochastic_encode(cfm):
    m, params = cfm
    x0 = jnp.ones((1, 6, 8))
    enc = m.stochastic_encode(x0, jnp.asarray(0), jax.random.PRNGKey(9))
    assert enc.shape == x0.shape
    assert np.isfinite(np.asarray(enc)).all()


def test_latent_length():
    m = CFM(unet_config=TINY_UNET, mel_dim=6)
    assert m.latent_length(16) == 8
    assert m.latent_length(15) == 8
    assert m.latent_length(1500) == 750


def test_encode_once_matches_full_recompute(cfm):
    """Hoisting the conditioning encode out of the ODE scan is bit-exact."""
    m, params = cfm
    cond = _cond()
    uncond = jax.tree_util.tree_map(
        lambda v: jnp.zeros_like(v) if hasattr(v, "shape") else v,
        {k: v for k, v in cond.items() if k != "name"})
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 8))
    a = euler_cfg_sample(m.model.apply, params, x0, cond, uncond, 2.0, 10,
                         encode_once=False)
    b = euler_cfg_sample(m.model.apply, params, x0, cond, uncond, 2.0, 10,
                         encode_once=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_cfg_shape_from_midi_only_cond(cfm):
    """log_images-style cond (midi/beats only, no 'acoustic' mel) must still
    derive the latent shape (regression: KeyError 'acoustic')."""
    m, params = cfm
    full = _cond()
    cond = {"caption": full["caption"],
            "acoustic": {"midi": full["acoustic"]["midi"],
                         "beats": full["acoustic"]["beats"]}}
    z = m.sample_cfg(params, cond, 1.0, None, jax.random.PRNGKey(9),
                     timesteps=2)
    T_mel = full["acoustic"]["midi"].shape[2]
    assert z.shape == (2, 6, m.latent_length(T_mel))
