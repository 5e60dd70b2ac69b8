"""Shape/semantics tests for the 1-D KL-VAE (shipped ae_accomp config, scaled down)."""

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.models.autoencoder import AutoencoderKL, Encoder1D, Decoder1D
from versband_tpu.models.distributions import DiagonalGaussian
import pytest

TINY_DD = dict(
    double_z=True, in_channels=80, out_ch=80, z_channels=20, kernel_size=5,
    ch=32, ch_mult=[1, 2, 4], num_res_blocks=2, attn_layers=[3], down_layers=[0],
    dropout=0.0,
)


def _build(dd=TINY_DD, embed_dim=20):
    m = AutoencoderKL(embed_dim=embed_dim, ddconfig=dd)
    x = jnp.zeros((2, 80, 64))
    params = m.init({"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x)
    return m, params


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    m, params = _build()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 64))
    post = m.apply(params, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (2, 20, 32)  # 2x temporal downsample, 20-ch latent
    z = post.mode()
    rec = m.apply(params, z, method=AutoencoderKL.decode)
    assert rec.shape == (2, 80, 64)


@pytest.mark.slow
def test_vae_forward_posterior_sampling():
    m, params = _build()
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 64))
    rec1, post = m.apply(params, x, rngs={"gaussian": jax.random.PRNGKey(4)})
    rec2, _ = m.apply(params, x, rngs={"gaussian": jax.random.PRNGKey(5)})
    assert rec1.shape == (1, 80, 64)
    # different gaussian keys -> different samples -> different recons
    assert not np.allclose(np.asarray(rec1), np.asarray(rec2))
    # deterministic mode path
    rec3, _ = m.apply(params, x, sample_posterior=False, rngs={"gaussian": jax.random.PRNGKey(6)})
    rec4, _ = m.apply(params, x, sample_posterior=False, rngs={"gaussian": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(rec3), np.asarray(rec4), atol=0)


def test_diagonal_gaussian_math():
    rng = np.random.default_rng(0)
    moments = jnp.asarray(rng.standard_normal((2, 8, 5)).astype(np.float32))
    g = DiagonalGaussian(moments)
    assert g.mean.shape == (2, 4, 5)
    # standard-normal prior KL of zero-mean unit-var posterior is 0
    zeros = jnp.zeros((2, 8, 5))
    g0 = DiagonalGaussian(zeros)
    np.testing.assert_allclose(np.asarray(g0.kl()), 0.0, atol=1e-6)
    # NLL of the mean equals the entropy-ish term
    nll = g.nll(g.mean)
    expect = 0.5 * np.sum(np.log(2 * np.pi) + np.asarray(g.logvar), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(nll), expect, rtol=1e-5)


@pytest.mark.slow
def test_encoder_downsample_odd_length():
    """(0,1)-padded stride-2 valid conv: T -> floor((T-1)/2)+1, matching torch's
    Conv1d(k=3, s=2) after (0,1) pad as in the reference Downsample1D
    (autoencoder1d.py:294-313): 33 -> 16, 64 -> 32."""
    enc = Encoder1D(ch=16, ch_mult=(1, 2), num_res_blocks=1, down_layers=(0,),
                    in_channels=8, z_channels=4, kernel_size=3)
    x = jnp.zeros((1, 33, 8))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (1, 16, 8)  # double_z -> 2*4 ch
    import torch
    tl = torch.nn.Conv1d(8, 8, 3, stride=2, padding=0)
    tout = tl(torch.nn.functional.pad(torch.zeros(1, 8, 33), (0, 1)))
    assert tout.shape[-1] == 16
