"""Legacy backbones: TimeFreqMoeDiT hard routing, ConcatDiT family shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.models.dit_timefreq import TimeFreqMoeDiT, TimeFreqMoE
from versband_tpu.models.concat_dit import (
    ConcatDiT, ConcatDiT2MLP, HybridDiT2MLP, PositionEmbedding)


def test_timefreq_moe_hard_time_routing():
    m = TimeFreqMoE(dim=8, hidden_dim=32, num_experts=4, multiple_of=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8))
    params = m.init(jax.random.PRNGKey(1), x, jnp.array([0.0, 900.0]))
    # same x, timesteps in different quarters -> different expert -> different out
    out_a = m.apply(params, x, jnp.array([100.0, 100.0]))
    out_b = m.apply(params, x, jnp.array([600.0, 600.0]))
    # different quarters route to different experts: diff >> output scale
    scale = float(np.abs(np.asarray(out_a)).mean()) + 1e-12
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > scale
    # same quarter -> identical
    out_c = m.apply(params, x, jnp.array([120.0, 120.0]))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_c), atol=1e-6)


def test_timefreq_dit_forward():
    m = TimeFreqMoeDiT(in_channels=4, context_dim=12, hidden_size=16, depth=2,
                       num_heads=2, max_len=32, num_experts=4, multiple_of=8)
    x = jnp.zeros((2, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 12))
    params = m.init(jax.random.PRNGKey(1), x, jnp.zeros((2,)), ctx)
    out, lb = m.apply(params, x, jnp.array([10.0, 800.0]), ctx)
    assert out.shape == (2, 4, 16)
    assert float(lb) == 0.0


def test_concat_dit_variants():
    for cls in (ConcatDiT, ConcatDiT2MLP):
        m = cls(in_channels=4, context_dim=12, hidden_size=16, depth=2,
                num_heads=2, max_len=64)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 20))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 12))
        params = m.init(jax.random.PRNGKey(2), x, jnp.zeros((1,)), ctx)
        out, lb = m.apply(params, x, jnp.array([5.0]), ctx)
        assert out.shape == (1, 4, 20)  # prefix sliced off
        # zero-init final conv -> zero output at init
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_hybrid_dit_with_codes():
    m = HybridDiT2MLP(in_channels=4, context_dim=12, hidden_size=16, depth=1,
                      num_heads=2, max_len=64, code_num=32, codebook_num=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 20))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 12))
    codes = jnp.zeros((1, 2, 20), jnp.int32)
    context = {"c_crossattn": ctx, "c_concat": {"acoustic": codes}}
    params = m.init(jax.random.PRNGKey(2), x, jnp.zeros((1,)), context)
    out, _ = m.apply(params, x, jnp.array([5.0]), context)
    assert out.shape == (1, 4, 20)


def test_position_embedding_truncates():
    pe = PositionEmbedding(32, 8)
    x = jnp.zeros((1, 10, 8))
    params = pe.init(jax.random.PRNGKey(0), x)
    out = pe.apply(params, x)
    assert out.shape == (1, 10, 8)
