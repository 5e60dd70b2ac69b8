"""BigVGAN parity tests: kaiser-sinc resampling vs a torch reference, snake
activation semantics, generator shapes."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from versband_tpu.vocoder.bigvgan import (
    kaiser_sinc_filter1d, UpSample1d, DownSample1d, snake, Activation1d,
    BigVGANGenerator, VocoderBigVGAN)


def _torch_upsample(x_np, ratio):
    # torch semantics of alias_free_torch.UpSample1d (resample.py:10-33)
    k = int(6 * ratio // 2) * 2
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    filt = torch.from_numpy(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
    C = x_np.shape[1]
    x = F.pad(torch.from_numpy(x_np), (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(x, filt.expand(C, 1, -1), stride=ratio, groups=C)
    return y[..., pad_left:-pad_right].numpy()


@pytest.mark.parametrize("ratio", [2, 4])
def test_upsample_matches_torch(ratio):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 40).astype(np.float32)  # [B, C, T]
    ref = _torch_upsample(x, ratio)
    out = UpSample1d(ratio).apply({}, jnp.asarray(x.transpose(0, 2, 1)))
    out = np.asarray(out).transpose(0, 2, 1)
    assert out.shape == ref.shape == (2, 3, 40 * ratio)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_downsample_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 64).astype(np.float32)
    ratio = 2
    k = int(6 * ratio // 2) * 2
    filt = torch.from_numpy(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
    even = k % 2 == 0
    xt = F.pad(torch.from_numpy(x), (k // 2 - int(even), k // 2), mode="replicate")
    ref = F.conv1d(xt, filt.expand(2, 1, -1), stride=ratio, groups=2).numpy()
    out = DownSample1d(ratio).apply({}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-5, rtol=1e-5)


def test_snake_formula():
    x = jnp.linspace(-2, 2, 32).reshape(1, 8, 4)
    alpha = jnp.asarray([0.0, 0.5, -0.3, 1.0])  # logscale params
    out = snake(x, alpha, logscale=True)
    a = np.exp(np.asarray(alpha))
    ref = np.asarray(x) + (1.0 / (a + 1e-9)) * np.sin(np.asarray(x) * a) ** 2
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # snakebeta: separate magnitude
    beta = jnp.asarray([1.0, 0.0, 0.0, -1.0])
    out_b = snake(x, alpha, beta, logscale=True)
    b = np.exp(np.asarray(beta))
    ref_b = np.asarray(x) + (1.0 / (b + 1e-9)) * np.sin(np.asarray(x) * a) ** 2
    np.testing.assert_allclose(np.asarray(out_b), ref_b, atol=1e-5)


def test_activation1d_preserves_length():
    m = Activation1d(channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 4))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == x.shape


@pytest.mark.slow
def test_generator_shapes_and_wrapper():
    gen = BigVGANGenerator(upsample_initial_channel=32,
                           upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                           resblock_kernel_sizes=(3,),
                           resblock_dilation_sizes=((1, 3, 5),))
    mel = jnp.zeros((1, 80, 16))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (1, 16 * 16)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)

    voc = VocoderBigVGAN(None, upsample_initial_channel=32,
                         upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3, 5),))
    out = voc.vocode(np.zeros((80, 12), np.float32))
    assert out.shape == (12 * 16,)
