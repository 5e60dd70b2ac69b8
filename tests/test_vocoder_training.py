"""Vocoder GAN train steps: both optimizers move, losses finite, PWG warmup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.train.state import TrainState, make_adamw, make_radam
from versband_tpu.train.vocoder_step import (
    make_hifigan_train_step, make_pwg_train_step)
from versband_tpu.vocoder.discriminators import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator)
from versband_tpu.vocoder.hifigan import HifiGanGenerator
from versband_tpu.vocoder.pwg import (
    ParallelWaveGANDiscriminator, ParallelWaveGANGenerator)


def _delta(a, b):
    return jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda p, q: p - q, a, b), 0.0)


@pytest.mark.slow
def test_hifigan_gan_step():
    gen = HifiGanGenerator(upsample_initial_channel=16,
                           upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                           resblock_kernel_sizes=(3,),
                           resblock_dilation_sizes=((1, 3),))
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    msd = MultiScaleDiscriminator()
    T_mel, hop = 12, 16
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 80, T_mel))
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, T_mel * hop)) * 0.1

    gp = gen.init(jax.random.PRNGKey(2), mel)
    y = wav[:, None, :]
    dp = {"mpd": mpd.init(jax.random.PRNGKey(3), y, y),
          "msd": msd.init(jax.random.PRNGKey(4), y, y)}
    gen_state = TrainState.create(gp, make_adamw(1e-4))
    disc_state = TrainState.create(dp, make_adamw(1e-4))

    def mel_fn(w):
        # cheap surrogate mel for the L1 term
        return w.reshape(w.shape[0], -1, hop).mean(-1)[:, None, :]

    step = jax.jit(make_hifigan_train_step(gen, mpd, msd, mel_fn))
    g2, d2, metrics = step(gen_state, disc_state, {"mel": mel, "wav": wav})
    for k in ("disc_loss", "gen_adv", "fm_loss", "mel_l1"):
        assert np.isfinite(float(metrics[k])), k
    assert _delta(g2.params, gen_state.params) > 0
    assert _delta(d2.params, disc_state.params) > 0


@pytest.mark.slow
def test_pwg_step_with_warmup_gating():
    gen = ParallelWaveGANGenerator(layers=2, stacks=1, residual_channels=4,
                                   gate_channels=8, skip_channels=4,
                                   aux_channels=8, aux_context_window=1,
                                   upsample_scales=(4,))
    disc = ParallelWaveGANDiscriminator(layers=3, conv_channels=4)
    T_mel, hop, w = 8, 4, 1
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 8, T_mel + 2 * w))
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 1, T_mel * hop))
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, T_mel * hop)) * 0.1

    gp = gen.init(jax.random.PRNGKey(3), noise, mel)
    dp = disc.init(jax.random.PRNGKey(4), wav[:, None, :])
    gen_state = TrainState.create(gp, make_radam(1e-4))
    disc_state = TrainState.create(dp, make_radam(1e-4))

    step = jax.jit(make_pwg_train_step(gen, disc, disc_start=100))
    g2, d2, m = step(gen_state, disc_state,
                     {"mel": mel, "noise": noise, "wav": wav})
    assert np.isfinite(float(m["sc_loss"])) and np.isfinite(float(m["mag_loss"]))
    # before disc_start: generator trains on STFT only, disc grads are gated
    assert _delta(g2.params, gen_state.params) > 0
    assert _delta(d2.params, disc_state.params) == pytest.approx(0.0, abs=1e-12)


@pytest.mark.slow
def test_bigvgan_gan_step_trains_with_unfused_activations():
    """BigVGAN must be trainable: use_fused=False routes around the Pallas
    activation (inference-only, no VJP); use_fused=True is rejected early."""
    from versband_tpu.vocoder.bigvgan import BigVGANGenerator

    gen = BigVGANGenerator(upsample_initial_channel=16,
                           upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                           resblock_kernel_sizes=(3,),
                           resblock_dilation_sizes=((1, 3),),
                           use_fused=False)
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    msd = MultiScaleDiscriminator()
    T_mel, hop = 12, 16
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 80, T_mel))
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, T_mel * hop)) * 0.1

    gp = gen.init(jax.random.PRNGKey(2), mel)
    y = wav[:, None, :]
    dp = {"mpd": mpd.init(jax.random.PRNGKey(3), y, y),
          "msd": msd.init(jax.random.PRNGKey(4), y, y)}
    gen_state = TrainState.create(gp, make_adamw(1e-4))
    disc_state = TrainState.create(dp, make_adamw(1e-4))

    def mel_fn(w):
        return w.reshape(w.shape[0], -1, hop).mean(-1)[:, None, :]

    step = jax.jit(make_hifigan_train_step(gen, mpd, msd, mel_fn))
    g2, d2, metrics = step(gen_state, disc_state, {"mel": mel, "wav": wav})
    for k in ("disc_loss", "gen_adv", "fm_loss", "mel_l1"):
        assert np.isfinite(float(metrics[k])), k
    assert _delta(g2.params, gen_state.params) > 0

    with pytest.raises(ValueError, match="use_fused"):
        make_hifigan_train_step(BigVGANGenerator(), mpd, msd, mel_fn)
