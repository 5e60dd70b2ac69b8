"""Vocoder GAN training steps — mel->wav generator training with the
reference's loss recipes, as jitted dual-optimizer functions.

Covers the training side of the vocoder deliverables (SURVEY.md §2.8):
  * HiFi-GAN / BigVGAN recipe: MPD + MSD (or MRD) discriminators, LSGAN
    adversarial + feature-matching + L1-mel losses
    (``vocoder/hifigan/modules/hifigan.py:344-382``);
  * ParallelWaveGAN recipe: multi-resolution STFT loss + single discriminator
    adversarial term (``vocoder/parallel_wavegan/losses/stft_loss.py``).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from versband_tpu.train.state import TrainState
from versband_tpu.vocoder.discriminators import (
    discriminator_loss, feature_loss, generator_loss)
from versband_tpu.vocoder.losses import multi_resolution_stft_loss

Array = jax.Array


def make_hifigan_train_step(generator, mpd, msd, mel_fn: Callable,
                            lambda_fm: float = 2.0, lambda_mel: float = 45.0):
    """HiFi-GAN step. ``mel_fn(wav [B, T]) -> mel`` for the mel L1 term.

    ``batch`` = {'mel': [B, 80, T'], 'wav': [B, T]}.
    Returns ``step(gen_state, disc_state, batch) -> (states, metrics)``;
    ``disc_state.params`` = {'mpd': ..., 'msd': ...}.
    """
    if getattr(generator, "use_fused", False):
        raise ValueError(
            "this generator was built with use_fused=True: the fused Pallas "
            "activation is inference-only (pallas_call has no VJP) — "
            "construct the training generator with use_fused=False")

    def step(gen_state: TrainState, disc_state: TrainState,
             batch: Dict[str, Array]):
        mel, wav = batch["mel"], batch["wav"]
        y = wav[:, None, :]

        # --- discriminator update -----------------------------------
        y_hat = jax.lax.stop_gradient(
            generator.apply(gen_state.params, mel))[:, None, :]

        def d_loss_fn(d_params):
            rs, gs, _, _ = mpd.apply(d_params["mpd"], y, y_hat)
            r1, g1 = discriminator_loss(rs, gs)
            rs2, gs2, _, _ = msd.apply(d_params["msd"], y, y_hat)
            r2, g2 = discriminator_loss(rs2, gs2)
            d = r1 + g1 + r2 + g2
            return d, {"disc_loss": d}

        (dl, dm), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            disc_state.params)
        disc_state = disc_state.apply_gradients(d_grads)

        # --- generator update ----------------------------------------
        def g_loss_fn(g_params):
            wav_hat = generator.apply(g_params, mel)
            y_g = wav_hat[:, None, :]
            _, gs, fr, fg = mpd.apply(disc_state.params["mpd"], y, y_g)
            _, gs2, fr2, fg2 = msd.apply(disc_state.params["msd"], y, y_g)
            adv = generator_loss(gs) + generator_loss(gs2)
            fm = feature_loss(fr, fg) + feature_loss(fr2, fg2)
            mel_l1 = jnp.mean(jnp.abs(mel_fn(wav_hat) - mel_fn(wav)))
            total = adv + lambda_fm * fm + lambda_mel * mel_l1
            return total, {"gen_adv": adv, "fm_loss": fm, "mel_l1": mel_l1,
                           "gen_loss": total}

        (gl, gm), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gen_state.params)
        gen_state = gen_state.apply_gradients(g_grads)
        return gen_state, disc_state, {**dm, **gm}

    return step


def make_pwg_train_step(generator, discriminator, lambda_adv: float = 4.0,
                        disc_start: int = 100_000):
    """ParallelWaveGAN step: MR-STFT + (warmed-up) adversarial loss.

    ``batch`` = {'mel': [B, 80, T'+2w], 'noise': [B, 1, T], 'wav': [B, T]}.
    """

    def step(gen_state: TrainState, disc_state: TrainState,
             batch: Dict[str, Array]):
        mel, noise, wav = batch["mel"], batch["noise"], batch["wav"]
        warm = (gen_state.step >= disc_start).astype(jnp.float32)

        def g_loss_fn(g_params):
            wav_hat = generator.apply(g_params, noise, mel)[:, 0, :]
            sc, mag = multi_resolution_stft_loss(wav_hat, wav)
            # LSGAN generator term matching the discriminator's mse losses
            # (the upstream parallel_wavegan recipe: mse(D(fake), 1)); the
            # previous -mean(D(fake)) is unbounded below against an mse-
            # trained discriminator
            adv = jnp.mean((1.0 - discriminator.apply(
                disc_state.params, wav_hat[:, None, :])) ** 2)
            total = sc + mag + warm * lambda_adv * adv
            return total, (wav_hat, {"sc_loss": sc, "mag_loss": mag,
                                     "gen_adv": adv, "gen_loss": total})

        (gl, (wav_hat, gm)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen_state.params)
        gen_state = gen_state.apply_gradients(g_grads)

        wav_hat = jax.lax.stop_gradient(wav_hat)

        def d_loss_fn(d_params):
            real = discriminator.apply(d_params, wav[:, None, :])
            fake = discriminator.apply(d_params, wav_hat[:, None, :])
            d = jnp.mean((1.0 - real) ** 2) + jnp.mean(fake ** 2)
            return warm * d, {"disc_loss": d}

        (dl, dm), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            disc_state.params)
        disc_state = disc_state.apply_gradients(d_grads)
        return gen_state, disc_state, {**gm, **dm}

    return step
