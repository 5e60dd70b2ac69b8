"""Tests for the Band-MOE DiT backbone (tiny configuration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.dit import (
    BandMoeDiT, BandMoE, StackedSwiGLU, gumbel_softmax,
    anneal_temperature, anneal_loss_weight,
)

TINY = dict(in_channels=8, context_dim=32, hidden_size=32, depth=2, num_heads=4,
            max_len=64, num_experts=4, ori_dim=24, multiple_of=16)


def _ctx(B=2, T_mel=24, Ty=5, ori=24):
    key = jax.random.PRNGKey(0)
    return {
        "c_concat": {
            "midi": jax.random.randint(key, (B, 1, T_mel), 0, 130),
            "beats": jax.random.randint(key, (B, 1, T_mel), 0, 3),
        },
        "c_crossattn": jax.random.normal(key, (B, Ty, ori)),
    }


@pytest.fixture(scope="module")
def dit_and_params():
    m = BandMoeDiT(**TINY)
    B, T_lat = 2, 12
    x = jnp.zeros((B, 8, T_lat))
    t = jnp.zeros((B,), jnp.int32)
    params = m.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
                    x, t, _ctx())
    return m, params


@pytest.mark.slow
def test_dit_forward_shapes(dit_and_params):
    m, params = dit_and_params
    B, T_lat = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 8, T_lat))
    t = jnp.asarray([100, 500])
    out, lb = m.apply(params, x, t, _ctx())
    assert out.shape == (B, 8, T_lat)
    assert np.isfinite(np.asarray(out)).all()
    assert lb.shape == ()


def test_dit_zero_init_output(dit_and_params):
    """adaLN-zero: at init the final layer is zeroed so output is exactly 0."""
    m, params = dit_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12))
    out, _ = m.apply(params, x, jnp.zeros((2,), jnp.int32), _ctx())
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit_eval_deterministic(dit_and_params):
    m, params = dit_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 12))
    t = jnp.asarray([3, 7])
    a, _ = m.apply(params, x, t, _ctx())
    b, _ = m.apply(params, x, t, _ctx())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_dit_train_grads_flow(dit_and_params):
    m, params = dit_and_params
    # adaLN-zero blocks expert grads at exact init; perturb away from zero
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(42), p.shape, p.dtype),
        params)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 12))
    t = jnp.asarray([10, 20])
    ctx = _ctx()

    def loss_fn(p):
        out, lb = m.apply(p, x, t, ctx, step=0, train=True,
                          rngs={"gumbel": jax.random.PRNGKey(6)})
        return jnp.mean(out**2) + lb

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # expert weights get gradients (dense mixing keeps all experts alive)
    ge = g["params"]["blocks_0"]["feed_forward"]["caption_experts"]["w1"]
    assert float(jnp.abs(ge).sum()) > 0


@pytest.mark.slow
def test_length_reconciliation(dit_and_params):
    """T_mel odd -> acoustic T_mel//2 vs latent ceil: +-2 reconciliation must hold."""
    m, params = dit_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 13))  # latent 13
    ctx = _ctx(T_mel=25)  # acoustic pool -> 12
    out, _ = m.apply(params, x, jnp.asarray([1, 2]), ctx)
    assert out.shape == (2, 8, 13)


def test_gumbel_softmax_modes():
    logits = jnp.asarray([[2.0, 1.0, -1.0, 0.0]])
    hard = gumbel_softmax(logits, 1.0, hard=True)  # deterministic argmax
    np.testing.assert_allclose(np.asarray(hard), [[1, 0, 0, 0]], atol=1e-6)
    soft = gumbel_softmax(logits, 1.0, hard=False)
    np.testing.assert_allclose(np.asarray(soft).sum(), 1.0, rtol=1e-6)
    noisy = gumbel_softmax(logits, 1.0, hard=False, key=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(noisy), np.asarray(soft))


def test_annealing_schedules():
    assert float(anneal_temperature(0)) == 2.0
    assert abs(float(anneal_temperature(1)) - 2.0 * 0.9999) < 1e-6
    assert float(anneal_temperature(10**6)) == pytest.approx(0.3)
    assert float(anneal_loss_weight(0)) == 1.0
    assert float(anneal_loss_weight(10**6)) == pytest.approx(0.01)


@pytest.mark.slow
def test_stacked_swiglu_equals_loop():
    """Stacked einsum experts == E independent SwiGLU FFNs."""
    E, d, hdim = 3, 8, 16
    m = StackedSwiGLU(E, d, hdim, multiple_of=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, d))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)  # [E,B,T,d]
    w1, w2, w3 = (np.asarray(params["params"][k]) for k in ("w1", "w2", "w3"))
    xn = np.asarray(x)
    for e in range(E):
        a = xn @ w1[e]
        b = xn @ w3[e]
        ref = (a / (1 + np.exp(-a)) * b) @ w2[e]
        np.testing.assert_allclose(np.asarray(out[e]), ref, atol=1e-4)


@pytest.mark.slow
def test_routed_swiglu_matches_dense_onehot_mix():
    """Eval fast path: ragged_dot routed experts == dense compute + one-hot mix."""
    E, d, hdim = 4, 8, 16
    m = StackedSwiGLU(E, d, hdim, multiple_of=4)
    B, T = 2, 7
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, d))
    params = m.init(jax.random.PRNGKey(1), x)
    idx = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, E)

    routed = m.apply(params, x, idx=idx)                        # [B,T,d]
    dense = m.apply(params, x)                                  # [E,B,T,d]
    onehot = jax.nn.one_hot(idx, E)                             # [B,T,E]
    mixed = jnp.einsum("ebtd,bte->btd", dense, onehot)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(mixed),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_band_diagonal_swiglu_matches_masked_dense():
    """Freq-expert fast path: sliced-weight contraction == zero-masked dense."""
    E, d, hdim = 4, 16, 16
    m = StackedSwiGLU(E, d, hdim, multiple_of=4)
    B, T = 2, 5
    y = jax.random.normal(jax.random.PRNGKey(3), (B, T, d))
    params = m.init(jax.random.PRNGKey(4), y)

    fast = m.apply(params, y, band_diagonal=True)               # [B,T,d]

    band = d // E
    ch = jnp.arange(d)
    band_mask = ((ch[None, :] >= band * jnp.arange(E)[:, None])
                 & (ch[None, :] < band * (jnp.arange(E)[:, None] + 1))
                 ).astype(y.dtype)                              # [E,d]
    y_banded = y[None] * band_mask[:, None, None, :]            # [E,B,T,d]
    dense = m.apply(params, y_banded)
    ref = jnp.einsum("ebtd,ed->btd", dense, band_mask)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
