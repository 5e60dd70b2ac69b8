"""Legacy 2-D VAE/VQ family: shapes, quantizer semantics, interfaces."""

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.models.autoencoder2d import (
    AutoencoderKL2D, VQModel, VQModelInterface, VectorQuantizer,
    IdentityFirstStage)

DD = dict(ch=8, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
          in_channels=1, resolution=32, z_channels=3, out_ch=1)


def test_kl2d_roundtrip():
    m = AutoencoderKL2D(embed_dim=3, ddconfig=DD)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
    params = m.init({"params": jax.random.PRNGKey(1),
                     "gaussian": jax.random.PRNGKey(2)}, x)
    post = m.apply(params, x, method="encode")
    assert post.mean.shape == (1, 3, 8, 8)  # one 2x downsample
    rec = m.apply(params, post.mode(), method="decode")
    assert rec.shape == x.shape


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    zq, loss, idx = vq.apply(params, z)
    assert zq.shape == z.shape and idx.shape == (2, 5)
    assert float(loss) > 0
    # quantized values come from the codebook
    cb = np.asarray(params["params"]["embedding"])
    np.testing.assert_allclose(np.asarray(zq[0, 0]), cb[int(idx[0, 0])],
                               atol=1e-6)
    # straight-through: gradient wrt z is identity-ish (nonzero)
    g = jax.grad(lambda z: vq.apply(params, z)[0].sum())(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_vqmodel_and_interface():
    m = VQModel(embed_dim=3, n_embed=8, ddconfig=DD)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    rec, loss = m.apply(params, x)
    assert rec.shape == x.shape and float(loss) >= 0

    mi = VQModelInterface(embed_dim=3, n_embed=8, ddconfig=DD)
    pi = mi.init(jax.random.PRNGKey(1), x)
    h = mi.apply(pi, x, method="encode")
    assert h.shape == (1, 3, 8, 8)  # pre-quant latents
    dec = mi.apply(pi, h, method="decode")
    assert dec.shape == x.shape


def test_identity_first_stage():
    fs = IdentityFirstStage(vq_interface=True)
    x = np.ones(3)
    assert fs.encode(x) is x and fs.decode(x) is x
    q = fs.quantize(x)
    assert q[0] is x
