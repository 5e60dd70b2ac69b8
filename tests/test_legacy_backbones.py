"""Legacy backbones: TimeFreqMoeDiT hard routing, ConcatDiT family shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.dit_timefreq import TimeFreqMoeDiT, TimeFreqMoE
from versband_tpu.models.concat_dit import (
    ConcatDiT, ConcatDiT2MLP, ConcatOrderDiT, ConcatOrderDiT2, HybridDiT2MLP,
    HybridDiT2MLP2, PositionEmbedding)


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


@pytest.mark.slow
def test_timefreq_dit_forward():
    m = TimeFreqMoeDiT(in_channels=4, context_dim=12, hidden_size=16, depth=2,
                       num_heads=2, max_len=32, num_experts=4, multiple_of=8)
    x = jnp.zeros((2, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 12))
    params = m.init(jax.random.PRNGKey(1), x, jnp.zeros((2,)), ctx)
    out, lb = m.apply(params, x, jnp.array([10.0, 800.0]), ctx)
    assert out.shape == (2, 4, 16)
    assert float(lb) == 0.0


@pytest.mark.slow
def test_concat_dit_variants():
    # hidden must be a multiple of 32 (TemporalTransformer GroupNorm groups)
    for cls in (ConcatDiT, ConcatDiT2MLP):
        m = cls(in_channels=4, context_dim=12, hidden_size=32, depth=2,
                num_heads=2, max_len=64)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 20))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 12))
        params = m.init(jax.random.PRNGKey(2), x, jnp.zeros((1,)), ctx)
        out, lb = m.apply(params, x, jnp.array([5.0]), ctx)
        assert out.shape == (1, 4, 20)  # prefix sliced off
        assert float(lb) == 0.0


@pytest.mark.slow
def test_hybrid_dit_with_codes():
    # codes arrive at mel rate (2x the latent rate) and are avg-pooled 2x
    for cls, fuse in ((HybridDiT2MLP, None), (HybridDiT2MLP2, "concat_cut"),
                      (HybridDiT2MLP2, "concat_proj")):
        kw = {} if fuse is None else {"cond_fuse": fuse}
        m = cls(in_channels=4, context_dim=12, hidden_size=32, depth=1,
                num_heads=2, max_len=64, code_num=32, codebook_num=2, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 20))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 12))
        codes = jnp.zeros((1, 2, 40), jnp.int32)
        context = {"c_crossattn": ctx, "c_concat": {"acoustic": codes}}
        params = m.init(jax.random.PRNGKey(2), x, jnp.zeros((1,)), context)
        out, _ = m.apply(params, x, jnp.array([5.0]), context)
        assert out.shape == (1, 4, 20)


@pytest.mark.slow
def test_concat_order_dit_variants():
    B, Tc, T = 2, 9, 20
    # tokens: <start> tok tok <|> tok <|> tok <eos> <pad>
    token_ids = jnp.array([[101, 7, 8, 1064, 9, 1064, 11, 102, 0],
                           [101, 5, 1064, 6, 7, 102, 0, 0, 0]], jnp.int32)
    orders = jnp.array([[2, 0, 100, 100], [1, 100, 100, 100]], jnp.int32)
    ctx = {"token_embedding":
           jax.random.normal(jax.random.PRNGKey(1), (B, Tc, 12)),
           "token_ids": token_ids, "orders": orders}
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, T))
    for cls in (ConcatOrderDiT, ConcatOrderDiT2):
        kw = dict(max_objs=4) if cls is ConcatOrderDiT2 else {}
        m = cls(in_channels=4, context_dim=12, hidden_size=32, depth=1,
                num_heads=2, max_len=64, **kw)
        params = m.init(jax.random.PRNGKey(2), x, jnp.zeros((B,)), ctx)
        out, lb = m.apply(params, x, jnp.array([5.0, 80.0]), ctx)
        assert out.shape == (B, 4, T)
        assert float(lb) == 0.0


@pytest.mark.slow
def test_concat_order_dit2_insertion_layout():
    """Order tokens land immediately before their '|' separator; tail is
    pad-order embedding (the reference list.insert layout)."""
    B, Tc = 1, 5
    token_ids = jnp.array([[101, 7, 1064, 8, 102]], jnp.int32)
    orders = jnp.array([[3, 100, 100]], jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, Tc, 12))
    ctx = {"token_embedding": emb, "token_ids": token_ids, "orders": orders}
    x = jnp.zeros((B, 4, 8))
    m = ConcatOrderDiT2(in_channels=4, context_dim=12, hidden_size=32,
                        depth=1, num_heads=2, max_len=64, max_objs=3)
    params = m.init(jax.random.PRNGKey(2), x, jnp.zeros((B,)), ctx)

    # reconstruct the caption buffer exactly as the module does
    from versband_tpu.nn import ConditionEmbedder
    import flax.linen as fnn
    c = ConditionEmbedder(32, gelu_tanh=True, name="c_embedder").apply(
        {"params": params["params"]["c_embedder"]}, emb)
    table = params["params"]["order_embedding"]["embedding"]
    # expected: [c0, c1, order(3), c2(sep), c3, c4, pad, pad]  (Tc+max_objs=8)
    expected = jnp.stack([c[0, 0], c[0, 1], table[3], c[0, 2], c[0, 3],
                          c[0, 4], table[100], table[100]])
    # probe via a tiny forward hook: rebuild with the module's own math
    import versband_tpu.models.concat_dit as cd
    is_sep = token_ids == 1064
    sep_incl = jnp.cumsum(is_sep.astype(jnp.int32), axis=1)
    tok_pos = jnp.arange(Tc)[None, :] + sep_incl
    out_len = Tc + 3
    buf = jnp.concatenate([jnp.broadcast_to(table[100][None, None], (1, out_len, 32)),
                           jnp.zeros((1, 1, 32))], axis=1)
    batch = jnp.zeros((1, Tc), jnp.int32)
    tok_dst = jnp.where(tok_pos < out_len, tok_pos, out_len)
    buf = buf.at[batch, tok_dst].set(c)
    sep_excl = sep_incl - is_sep.astype(jnp.int32)
    ord_tok = jnp.take_along_axis(
        jnp.take(table, jnp.minimum(orders, 100), axis=0),
        jnp.minimum(sep_excl, 2)[..., None], axis=1)
    ord_dst = jnp.where(is_sep & (tok_pos - 1 < out_len), tok_pos - 1, out_len)
    buf = buf.at[batch, ord_dst].set(ord_tok)
    np.testing.assert_allclose(np.asarray(buf[0, :out_len]),
                               np.asarray(expected), atol=1e-5)


def test_position_embedding_truncates():
    pe = PositionEmbedding(32, 8)
    x = jnp.zeros((1, 10, 8))
    params = pe.init(jax.random.PRNGKey(0), x)
    out = pe.apply(params, x)
    assert out.shape == (1, 10, 8)
