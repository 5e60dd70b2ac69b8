"""Golden-vector tests for core NN primitives vs independent numpy/torch math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.nn import (
    RMSNorm, modulate, TimestepEmbedder, FeedForward, swiglu_hidden_dim,
    precompute_rope, apply_rope, JointAttention, sdpa,
)
from versband_tpu.nn.core import timestep_embedding


def test_rmsnorm_matches_numpy():
    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
    m = RMSNorm(dim=16)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    expect = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_timestep_embedding_cos_first():
    t = jnp.asarray([0.0, 250.0, 999.0])
    emb = np.asarray(timestep_embedding(t, 256))
    assert emb.shape == (3, 256)
    # t=0: cos part all ones, sin part all zeros
    np.testing.assert_allclose(emb[0, :128], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 128:], 0.0, atol=1e-6)
    # matches the documented formula
    half = 128
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = 250.0 * freqs
    np.testing.assert_allclose(emb[1], np.concatenate([np.cos(args), np.sin(args)]), atol=1e-5)


def test_rope_matches_complex_reference():
    """apply_rope must equal rotation by e^{i*t*freq} on interleaved pairs."""
    B, T, H, D = 2, 7, 3, 8
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, H, D)).astype(np.float32)
    cos, sin = precompute_rope(D, 16)
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    # complex reference
    xc = x[..., 0::2] + 1j * x[..., 1::2]  # [B,T,H,D/2]
    freqs = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    ang = np.arange(16)[:, None] * freqs[None, :]
    fc = np.exp(1j * ang)[:T][None, :, None, :]
    ref_c = xc * fc
    ref = np.empty_like(x)
    ref[..., 0::2] = ref_c.real
    ref[..., 1::2] = ref_c.imag
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_swiglu_hidden_rule():
    # MoE experts: hidden_dim = dim = 768 -> 512; attention FFN 4*768 -> 2048
    assert swiglu_hidden_dim(768) == 512
    assert swiglu_hidden_dim(4 * 768) == 2048
    assert swiglu_hidden_dim(4 * 1152) == 3072


def test_feedforward_shapes_and_gating():
    m = FeedForward(dim=32, hidden_dim=128, multiple_of=16)
    x = jnp.ones((2, 5, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    h = swiglu_hidden_dim(128, 16)
    assert params["params"]["w1"]["kernel"].shape == (32, h)
    out = m.apply(params, x)
    assert out.shape == (2, 5, 32)


def test_sdpa_vs_torch():
    import torch

    B, T, H, D = 2, 9, 4, 16
    rng = np.random.default_rng(2)
    q, k, v = (rng.standard_normal((B, T, H, D)).astype(np.float32) for _ in range(3))
    mask = np.ones((B, T), np.int32)
    mask[1, 6:] = 0
    ours = np.asarray(sdpa(*(jnp.asarray(a) for a in (q, k, v)), jnp.asarray(mask)))
    tq, tk, tv = (torch.from_numpy(a).permute(0, 2, 1, 3) for a in (q, k, v))
    tm = torch.from_numpy(mask).bool().view(B, 1, 1, T).expand(-1, H, T, -1)
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv, attn_mask=tm)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 1, 3).numpy(), atol=2e-5)


def test_joint_attention_gate_zero_init():
    """At init the cross-attention path must contribute nothing (zero tanh gate)."""
    m = JointAttention(dim=32, n_heads=4, y_dim=24)
    B, T, Ty = 2, 6, 5
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, 32))
    y = jax.random.normal(key, (B, Ty, 24))
    cos, sin = precompute_rope(8, T)
    params = m.init(key, x, None, jnp.asarray(cos), jnp.asarray(sin), y, None)
    out_with_y = m.apply(params, x, None, jnp.asarray(cos), jnp.asarray(sin), y, None)
    m2 = JointAttention(dim=32, n_heads=4, y_dim=0)
    params2 = {"params": {k: v for k, v in params["params"].items() if k in ("wq", "wk", "wv", "wo")}}
    out_no_y = m2.apply(params2, x, None, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.asarray(out_with_y), np.asarray(out_no_y), atol=1e-6)


def test_joint_attention_mask_invariance():
    """Padding tokens must not affect valid positions' outputs."""
    m = JointAttention(dim=32, n_heads=4)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 32))
    cos, sin = (jnp.asarray(a) for a in precompute_rope(8, 16))
    params = m.init(key, x, None, cos, sin)
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.int32))
    out_a = m.apply(params, x, mask, cos, sin)
    x_b = x.at[:, 5:].set(99.0)  # corrupt padding
    out_b = m.apply(params, x_b, mask, cos, sin)
    np.testing.assert_allclose(np.asarray(out_a[:, :5]), np.asarray(out_b[:, :5]), atol=1e-4)


def test_modulate():
    x = jnp.ones((2, 3, 4))
    shift = jnp.full((2, 4), 2.0)
    scale = jnp.full((2, 4), 0.5)
    np.testing.assert_allclose(np.asarray(modulate(x, shift, scale)), 3.5)
