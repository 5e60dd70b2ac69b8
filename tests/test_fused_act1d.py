"""Fused alias-free Snake kernel vs the unfused up->snake->down modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.ops.fused_act1d import fused_alias_free_snake
from versband_tpu.vocoder.bigvgan import (Activation1d, DownSample1d,
                                          UpSample1d, snake)


def _unfused(x, alpha, beta, logscale):
    up = UpSample1d(2)
    down = DownSample1d(2)
    y = up.apply({"params": {}}, x)
    y = snake(y, alpha, beta, logscale)
    return down.apply({"params": {}}, y)


@pytest.mark.parametrize("B,T,C", [(2, 64, 32), (1, 160, 16), (1, 96, 128)])
@pytest.mark.parametrize("logscale", [True, False])
@pytest.mark.slow
def test_fused_matches_unfused(B, T, C, logscale):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, C), jnp.float32)
    alpha = jax.random.normal(jax.random.fold_in(key, 1), (C,)) * 0.3
    beta = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.3

    ref = _unfused(x, alpha, beta, logscale)
    out = fused_alias_free_snake(x, alpha, beta, logscale)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_snake_variant_beta_none():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 8), jnp.float32)
    alpha = jnp.full((8,), 0.2)
    ref = _unfused(x, alpha, None, True)
    out = fused_alias_free_snake(x, alpha, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_activation1d_module_uses_fused_and_matches():
    m_f = Activation1d(channels=16, use_fused=True)
    m_u = Activation1d(channels=16, use_fused=False)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 16), jnp.float32)
    params = m_u.init(jax.random.PRNGKey(5), x)
    # nonzero snake params so the comparison is nontrivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 if p.ndim == 1 else p, params)
    out_f = m_f.apply(params, x)
    out_u = m_u.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("block_t,C", [(32, 16), (16, 32), (8, 64)])
@pytest.mark.slow
def test_fused_multi_block_seams(block_t, C):
    """Force nb>1 via explicit block_t: FIR taps reaching across block seams
    must read neighbor halo blocks (serving shapes run 100+ blocks, but the
    auto block-size search keeps the small default test shapes at nb=1)."""
    T = 512
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, T, C).astype(np.float32))
    alpha = jnp.asarray(rng.randn(C).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.3)

    ref = _unfused(x, alpha, beta, True)
    out = fused_alias_free_snake(x, alpha, beta, True, block_t=block_t)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_fallback_on_odd_length():
    x = jnp.zeros((1, 7, 8))  # T=7: no valid block -> fallback None
    out = fused_alias_free_snake(x, jnp.zeros((8,)))
    assert out is None


@pytest.mark.parametrize("T,C,logscale", [(64, 16, True), (231, 8, True),
                                          (480, 32, False), (96, 256, True)])
@pytest.mark.slow
def test_polyphase_matches_unfused(T, C, logscale):
    """The MXU polyphase formulation (4 stride-1 FIRs, no 2T intermediate)
    must match UpSample1d -> snake -> DownSample1d exactly, including at
    non-divisible T (no block constraint)."""
    from versband_tpu.vocoder.bigvgan import alias_free_snake_polyphase

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, T, C).astype(np.float32))
    alpha = jnp.asarray(rng.randn(C).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.3)
    out = alias_free_snake_polyphase(x, alpha, beta, logscale)
    assert out is not None and out.shape == x.shape

    m = Activation1d(channels=C, use_fused=False, logscale=logscale)
    params = {"params": {"alpha": alpha, "beta": beta}}
    ref = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
