"""VAE-GAN train step: both optimizers update, adaptive weight + R1 finite,
disc warm-up gating, loss module parity pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.autoencoder import AutoencoderKL
from versband_tpu.train.gan_losses import (
    VAEGANLoss, mse_d_loss, hinge_d_loss, adopt_weight)
from versband_tpu.train.state import TrainState, make_adam
from versband_tpu.train.vae_step import make_vae_train_step, make_vae_eval_step

TINY_DD = dict(double_z=True, in_channels=80, out_ch=80, z_channels=4,
               kernel_size=5, ch=16, ch_mult=[1, 2], num_res_blocks=1,
               attn_layers=[], down_layers=[0], dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    vae = AutoencoderKL(embed_dim=4, ddconfig=TINY_DD)
    loss = VAEGANLoss(disc_start=0, disc_hidden_size=8, disc_num_layers=2)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 80, 64))
    vae_params = vae.init({"params": jax.random.PRNGKey(1),
                           "gaussian": jax.random.PRNGKey(2)}, mel)
    post = vae.apply(vae_params, mel, method="encode")
    recon = vae.apply(vae_params, post.mode(), method="decode")
    loss_params = loss.init(jax.random.PRNGKey(3), mel, recon, post,
                            method="nll_kl")
    # discriminator params are created lazily per method; init via disc_forward
    loss_params = loss.init(jax.random.PRNGKey(3), mel, method="disc_forward")
    return vae, loss, mel, vae_params, loss_params


@pytest.mark.slow
def test_loss_pieces(setup):
    vae, loss, mel, vae_params, loss_params = setup
    post = vae.apply(vae_params, mel, method="encode")
    recon = vae.apply(vae_params, post.mode(), method="decode")
    stats = loss.apply(loss_params, mel, recon, post, method="nll_kl")
    assert float(stats["rec_loss"]) > 0
    assert np.isfinite(float(stats["kl_loss"]))
    # logvar=0 -> nll == sum|x-rec|/B
    expect = np.abs(np.asarray(mel) - np.asarray(recon)).sum() / mel.shape[0]
    np.testing.assert_allclose(float(stats["nll_loss"]), expect, rtol=1e-5)

    g = loss.apply(loss_params, recon, method="g_loss")
    assert np.isfinite(float(g))


def test_d_losses_and_adopt_weight():
    real = jnp.ones((2, 8))
    fake = -jnp.ones((2, 8))
    assert float(mse_d_loss(real, fake)) == pytest.approx(0.5)
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
    assert float(adopt_weight(2.0, 5, threshold=10)) == 0.0
    assert float(adopt_weight(2.0, 15, threshold=10)) == 2.0


@pytest.mark.slow
def test_train_step_updates_both(setup):
    vae, loss, mel, vae_params, loss_params = setup
    gen_state = TrainState.create(vae_params, make_adam(1e-3))
    disc_state = TrainState.create(loss_params, make_adam(1e-3))
    step = jax.jit(make_vae_train_step(vae, loss))
    g2, d2, metrics = step(gen_state, disc_state, {"image": mel},
                           jax.random.PRNGKey(0))
    for k in ("aeloss", "discloss", "d_weight", "r1_penalty", "rec_loss"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    delta_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, g2.params,
                               gen_state.params), 0.0)
    delta_d = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, d2.params,
                               disc_state.params), 0.0)
    assert delta_g > 0 and delta_d > 0
    assert int(g2.step) == 1

    # logvar must NOT move (not in the reference's optimizers)
    lv_before = float(disc_state.params["params"]["logvar"])
    # logvar lives in disc_state tree; disc opt DOES update it in this design?
    # It must not contribute grads: d_loss doesn't touch logvar.
    lv_after = float(d2.params["params"]["logvar"])
    assert lv_before == lv_after


@pytest.mark.slow
def test_disc_warmup_gates_adversarial(setup):
    vae, loss_on, mel, vae_params, loss_params = setup
    loss_off = VAEGANLoss(disc_start=10_000, disc_hidden_size=8,
                          disc_num_layers=2)
    gen_state = TrainState.create(vae_params, make_adam(1e-3))
    disc_state = TrainState.create(loss_params, make_adam(1e-3))
    step = jax.jit(make_vae_train_step(vae, loss_off))
    _, _, metrics = step(gen_state, disc_state, {"image": mel},
                         jax.random.PRNGKey(0))
    assert float(metrics["disc_factor"]) == 0.0  # step < disc_start


def test_eval_step(setup):
    vae, loss, mel, vae_params, loss_params = setup
    ev = jax.jit(make_vae_eval_step(vae, loss))
    m = ev(vae_params, loss_params, {"image": mel}, jax.random.PRNGKey(1))
    assert set(m) == {"val/rec_loss", "val/kl_loss", "val/mse"}
