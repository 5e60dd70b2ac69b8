"""ParallelWaveGAN / MelGAN / PQMF tests: shapes, PQMF near-perfect
reconstruction, MelGAN transposed-conv output-padding parity, loss sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.vocoder.pwg import (
    ParallelWaveGANGenerator, ParallelWaveGANDiscriminator, MelGANGenerator,
    MelGANMultiScaleDiscriminator, ConvInUpsampleNetwork, PQMF,
    design_prototype_filter)
from versband_tpu.vocoder.losses import (
    multi_resolution_stft_loss, stft_magnitude)
from versband_tpu.vocoder.discriminators import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator,
    MultiResolutionDiscriminator, NLayerDiscriminator,
    feature_loss, discriminator_loss, generator_loss)


@pytest.mark.slow
def test_pwg_generator_shapes():
    T_mel, hop = 10, 80  # scales (4,4,5)
    gen = ParallelWaveGANGenerator(
        layers=6, stacks=3, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=20, aux_context_window=2,
        upsample_scales=(4, 4, 5))
    w = 2  # context window consumed by VALID conv_in
    noise = jnp.zeros((1, 1, T_mel * hop))
    mel = jnp.zeros((1, 20, T_mel + 2 * w))
    params = gen.init(jax.random.PRNGKey(0), noise, mel)
    wav = gen.apply(params, noise, mel)
    assert wav.shape == (1, 1, T_mel * hop)


def test_pwg_discriminator_shapes():
    d = ParallelWaveGANDiscriminator(layers=4, conv_channels=8)
    x = jnp.zeros((2, 1, 100))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape == (2, 1, 100)


@pytest.mark.parametrize("scales", [(8, 8, 5), (4, 4, 4)])
@pytest.mark.slow
def test_melgan_generator_shapes(scales):
    gen = MelGANGenerator(channels=64, upsample_scales=scales, stacks=2)
    mel = jnp.zeros((1, 80, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (1, 1, 8 * int(np.prod(scales)))


@pytest.mark.slow
def test_melgan_multiscale_discriminator():
    d = MelGANMultiScaleDiscriminator()
    x = jnp.zeros((1, 1, 1024))
    params = d.init(jax.random.PRNGKey(0), x)
    outs = d.apply(params, x)
    assert len(outs) == 3
    assert all(len(o) >= 4 for o in outs)


def test_pqmf_near_perfect_reconstruction():
    pqmf = PQMF(subbands=4)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 1, 4 * 256).astype(np.float32)
    sub = pqmf.analysis(jnp.asarray(x))
    assert sub.shape == (1, 4, 256)
    rec = np.asarray(pqmf.synthesis(sub))
    assert rec.shape == x.shape
    # near-perfect reconstruction: the taps//2 pads already compensate the
    # filter group delay, leaving ~1 sample of residual shift
    a = rec[0, 0, 1:]
    b = x[0, 0, :-1]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_pqmf_prototype_matches_scipy_firwin_style():
    h = design_prototype_filter(62, 0.15, 9.0)
    assert h.shape == (63,)
    assert abs(h.sum() - 1.0) < 1e-3   # unity DC gain lowpass
    assert np.argmax(h) == 31          # symmetric peak at center
    np.testing.assert_allclose(h, h[::-1], atol=1e-12)  # linear phase


@pytest.mark.slow
def test_mrstft_loss_zero_for_identical():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2048).astype(np.float32))
    sc, mag = multi_resolution_stft_loss(x, x)
    assert float(sc) < 1e-6 and float(mag) < 1e-6
    y = jnp.asarray(rng.randn(2, 2048).astype(np.float32))
    sc2, mag2 = multi_resolution_stft_loss(x, y)
    assert float(sc2) > 0.1 and float(mag2) > 0.1


def test_stft_magnitude_matches_torch():
    import torch
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2048).astype(np.float32)
    mag = stft_magnitude(jnp.asarray(x), 512, 128, 512)
    ref = torch.stft(torch.from_numpy(x), 512, 128, 512,
                     torch.hann_window(512), center=True, pad_mode="reflect",
                     return_complex=True).abs().transpose(2, 1).numpy()
    assert mag.shape == ref.shape
    np.testing.assert_allclose(np.asarray(mag), np.clip(ref, np.sqrt(1e-7), None),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_hifigan_discriminators_and_losses():
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2000))
    y_hat = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 2000))

    mpd = MultiPeriodDiscriminator()
    p = mpd.init(jax.random.PRNGKey(2), y, y_hat)
    rs, gs, fr, fg = mpd.apply(p, y, y_hat)
    assert len(rs) == 5
    r_loss, g_loss = discriminator_loss(rs, gs)
    fl = feature_loss(fr, fg)
    gl = generator_loss(gs)
    for v in (r_loss, g_loss, fl, gl):
        assert np.isfinite(float(v))

    msd = MultiScaleDiscriminator()
    p = msd.init(jax.random.PRNGKey(3), y, y_hat)
    rs, gs, fr, fg = msd.apply(p, y, y_hat)
    assert len(rs) == 3


@pytest.mark.slow
def test_mrd_discriminator():
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4096))
    mrd = MultiResolutionDiscriminator(
        resolutions=((512, 128, 512), (1024, 256, 1024), (256, 64, 256)))
    p = mrd.init(jax.random.PRNGKey(1), y, y)
    rs, gs, fr, fg = mrd.apply(p, y, y)
    assert len(rs) == 3
    # identical inputs -> identical scores
    for r, g in zip(rs, gs):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g))


@pytest.mark.slow
def test_patchgan_discriminator():
    d = NLayerDiscriminator(ndf=16, n_layers=2, use_actnorm=True)
    x = jnp.zeros((2, 1, 80, 64))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.ndim == 4 and out.shape[0] == 2 and out.shape[1] == 1


@pytest.mark.slow
def test_pwg_runtime_wrapper_vocode():
    """ParallelWaveGAN wrapper: edge-padded mel -> T' x hop waveform, same
    calling convention as the HifiGAN/VocoderBigVGAN wrappers."""
    from versband_tpu.vocoder.pwg import ParallelWaveGAN

    voc = ParallelWaveGAN(layers=6, stacks=2, residual_channels=8,
                          gate_channels=16, skip_channels=8,
                          fused_inference=False)
    mel = np.random.RandomState(0).randn(80, 8).astype(np.float32)
    wav = voc.vocode(mel)
    assert wav.ndim == 1 and wav.shape[0] == 8 * 320
    assert np.isfinite(wav).all()
    # [T', 80] orientation auto-detected, __call__ aliases
    wav2 = voc(mel.T)
    assert wav2.shape == wav.shape


def test_generate_cli_vocoder_factory():
    from versband_tpu.cli.generate import build_vocoder

    for name in ("hifigan", "bigvgan", "nsf", "pwg"):
        voc = build_vocoder(name)
        assert callable(voc)
    import pytest

    with pytest.raises(ValueError):
        build_vocoder("nope")
