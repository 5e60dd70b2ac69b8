"""Dual-optimizer VAE-GAN train step (``autoencoder1d.py:75-146`` +
``contperceptual.py:73-149``), as one jitted function.

Per step (the Lightning loop alternates optimizer_idx 0/1 on the SAME batch;
here both updates run in one compiled program):
  1. generator pass: rec/nll/kl + adversarial g_loss with the adaptive
     d_weight ``||d nll / d last|| / ||d g / d last||`` computed by two scoped
     ``jax.grad`` calls wrt the decoder's conv_out kernel only (cheap: the
     backward stops at that leaf);
  2. discriminator pass on detached recon, MSE GAN loss + R1 gradient penalty
     (one ``jax.grad`` wrt the real input);
  3. Adam(0.5, 0.9) updates for {encoder, decoder, quant convs} and
     {discriminator} respectively; the loss module's ``logvar`` stays fixed,
     matching the reference's optimizer membership (``autoencoder1d.py:137-146``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from versband_tpu.train.gan_losses import VAEGANLoss, adopt_weight, adaptive_d_weight
from versband_tpu.train.state import TrainState

Array = jax.Array

LAST_LAYER_PATH = ("decoder", "conv_out", "kernel")


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_path(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_path(tree[path[0]], path[1:], value)}


def make_vae_train_step(vae, loss: VAEGANLoss):
    """Returns ``step(gen_state, disc_state, batch, key, global_step) ->
    (gen_state, disc_state, metrics)``; jit-compatible."""

    def step(gen_state: TrainState, disc_state: TrainState,
             batch: Dict[str, Any], key: jax.Array):
        mel = batch["image"]
        global_step = gen_state.step
        k_gauss = jax.random.fold_in(key, global_step)
        disc_factor = adopt_weight(loss.disc_factor, global_step,
                                   loss.disc_start)

        def forward(vae_params):
            return vae.apply(vae_params, mel, rngs={"gaussian": k_gauss})

        # ---- generator update ------------------------------------------
        def gen_losses(vae_params, disc_params):
            recon, post = forward(vae_params)
            stats = loss.apply(disc_params, mel, recon, post, method="nll_kl")
            g = loss.apply(disc_params, recon, method="g_loss")
            return recon, post, stats, g

        # adaptive weight: grads wrt the decoder's last-layer kernel only
        last = _get_path(gen_state.params["params"], LAST_LAYER_PATH)

        def nll_of_last(last_kernel):
            p = {"params": _set_path(gen_state.params["params"],
                                     LAST_LAYER_PATH, last_kernel)}
            _, _, stats, _ = gen_losses(p, disc_state.params)
            return stats["nll_loss"]

        def g_of_last(last_kernel):
            p = {"params": _set_path(gen_state.params["params"],
                                     LAST_LAYER_PATH, last_kernel)}
            return gen_losses(p, disc_state.params)[3]

        nll_gn = jnp.linalg.norm(jax.grad(nll_of_last)(last))
        g_gn = jnp.linalg.norm(jax.grad(g_of_last)(last))
        d_weight = adaptive_d_weight(nll_gn, g_gn, loss.disc_weight)

        def ae_loss_fn(vae_params):
            recon, post, stats, g = gen_losses(vae_params, disc_state.params)
            total = (stats["weighted_nll_loss"]
                     + loss.kl_weight * stats["kl_loss"]
                     + d_weight * disc_factor * g)
            return total, (recon, stats, g)

        (aeloss, (recon, stats, g_adv)), ae_grads = jax.value_and_grad(
            ae_loss_fn, has_aux=True)(gen_state.params)
        gen_state = gen_state.apply_gradients(ae_grads)

        # ---- discriminator update (detached recon) ---------------------
        recon_sg = jax.lax.stop_gradient(recon)

        def disc_loss_fn(disc_params):
            logits_fake = loss.apply(disc_params, recon_sg,
                                     method="disc_forward")

            def real_sum(x):
                return loss.apply(disc_params, x,
                                  method="disc_forward").sum()

            logits_real = loss.apply(disc_params, mel, method="disc_forward")
            d = disc_factor * loss.apply(
                disc_params, logits_real, logits_fake, method="d_loss")
            r1 = jnp.square(jax.grad(real_sum)(mel)).mean()
            d = d + loss.r1_reg_weight * r1
            return d, {"disc_loss": d, "r1_penalty": r1,
                       "logits_real": logits_real.mean(),
                       "logits_fake": logits_fake.mean()}

        (discloss, d_metrics), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(disc_state.params)
        disc_state = disc_state.apply_gradients(d_grads)

        metrics = {
            "aeloss": aeloss, "discloss": discloss,
            "rec_loss": stats["rec_loss"], "nll_loss": stats["nll_loss"],
            "kl_loss": stats["kl_loss"], "g_loss": g_adv,
            "d_weight": d_weight, "disc_factor": disc_factor,
            **d_metrics,
        }
        return gen_state, disc_state, metrics

    return step


def make_vae_eval_step(vae, loss: VAEGANLoss):
    """val pass: rec/nll/kl + both loss views without updates
    (``autoencoder1d.py:97-109``)."""

    def step(gen_params, disc_params, batch, key):
        mel = batch["image"]
        recon, post = vae.apply(gen_params, mel, rngs={"gaussian": key})
        stats = loss.apply(disc_params, mel, recon, post, method="nll_kl")
        mse = jnp.mean((recon - mel) ** 2)
        return {"val/rec_loss": stats["rec_loss"],
                "val/kl_loss": stats["kl_loss"], "val/mse": mse}

    return step
