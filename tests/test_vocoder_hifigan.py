"""HiFi-GAN parity tests: polyphase transposed conv vs torch, generator parity
with copied weights, wrapper API semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from versband_tpu.vocoder.conv import (
    WNConv1d, WNConvTranspose1d, polyphase_conv_transpose, fold_weight_norm)
from versband_tpu.vocoder.hifigan import HifiGanGenerator, ResBlock1, HifiGAN


@pytest.mark.parametrize("k,u,cin,cout,T", [
    (9, 5, 8, 6, 17),   # hop-320 stage 1 (pad 2)
    (8, 4, 6, 4, 13),   # stages 2-4 (pad 2)
    (10, 5, 4, 4, 11),  # odd/even mix (pad 2, out T*u+1... trimmed)
    (16, 8, 3, 5, 9),   # big stride (pad 4)
    (4, 2, 2, 2, 21),
])
def test_polyphase_matches_torch_conv_transpose(k, u, cin, cout, T):
    rng = np.random.RandomState(0)
    x = rng.randn(2, T, cin).astype(np.float32)
    w = rng.randn(k, cin, cout).astype(np.float32)  # flax layout
    pad = (k - u) // 2
    out = polyphase_conv_transpose(jnp.asarray(x), jnp.asarray(w), u, pad)
    # torch: input [B, C_in, T], weight [C_in, C_out, k]
    ref = F.conv_transpose1d(torch.from_numpy(x.transpose(0, 2, 1)),
                             torch.from_numpy(w.transpose(1, 2, 0)),
                             stride=u, padding=pad).numpy().transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_wnconv1d_matches_torch_weight_norm():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 8).astype(np.float32)
    m = WNConv1d(features=12, kernel_size=5, dilation=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))

    tconv = torch.nn.Conv1d(8, 12, 5, dilation=2, padding=4)
    v = np.asarray(params["params"]["kernel_v"])  # [k, in, out]
    g = np.asarray(params["params"]["kernel_g"])
    with torch.no_grad():
        tconv = torch.nn.utils.weight_norm(tconv)
        tconv.weight_v.copy_(torch.from_numpy(v.transpose(2, 1, 0)))
        tconv.weight_g.copy_(torch.from_numpy(g.reshape(-1, 1, 1)))
        tconv.bias.zero_()
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_generator_output_length_is_hop_times_frames():
    gen = HifiGanGenerator(upsample_initial_channel=32)
    mel = jnp.zeros((2, 80, 24))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 24 * 320)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)  # tanh output


@pytest.mark.slow
def test_fold_weight_norm_preserves_output():
    gen = HifiGanGenerator(upsample_initial_channel=16,
                           upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                           resblock_kernel_sizes=(3,),
                           resblock_dilation_sizes=((1, 3),))
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 16))
    params = gen.init(jax.random.PRNGKey(0), mel)
    out_wn = gen.apply(params, mel)

    folded = fold_weight_norm(params)
    gen_plain = gen.clone(use_weight_norm=False)
    out_folded = gen_plain.apply(folded, mel)
    np.testing.assert_allclose(np.asarray(out_wn), np.asarray(out_folded),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_wrapper_vocode_api():
    voc = HifiGAN(vocoder_ckpt=None, upsample_initial_channel=16,
                  upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8))
    mel = np.random.RandomState(0).randn(80, 12).astype(np.float32)
    wav = voc.vocode(mel)
    assert wav.shape == (12 * 16,)
    # [T, 80] orientation auto-transposed like the reference (hifigan.py:36-38)
    wav2 = voc.vocode(mel.T)
    np.testing.assert_allclose(wav, wav2, atol=1e-6)
