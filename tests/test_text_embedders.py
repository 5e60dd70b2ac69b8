"""Conditioning-encoder tests (offline: random-init towers + hash tokenizer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.text.embedders import (
    FlanT5Embedder, TextVocalEmbedder, TextVocalMusicalEmbedder,
    ClapTextEmbedder, ClapFlanEmbedder, ClassEmbedder, SpatialRescaler,
    HashTokenizer, projection_apply, _projection_params)

TINY_T5 = dict(d_model=32, d_ff=64, d_kv=8, num_heads=4, num_layers=1,
               vocab_size=512)
TINY_BERT = dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                 intermediate_size=64, vocab_size=512)


@pytest.fixture(scope="module")
def t5():
    return FlanT5Embedder("missing/path", max_length=16,
                          fallback_config=TINY_T5)


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(100)
    a = tok(["hello world"], 8)["input_ids"]
    b = tok(["hello world"], 8)["input_ids"]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 8)
    assert (a < 100).all()


def test_flan_t5_embedder_shapes(t5):
    z = t5(["a piano melody", "rock with drums"])
    assert z.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(z)).all()


def test_flan_t5_deterministic_frozen(t5):
    z1 = np.asarray(t5(["same text"]))
    z2 = np.asarray(t5(["same text"]))
    np.testing.assert_array_equal(z1, z2)


def test_text_vocal_embedder_passthrough():
    emb = TextVocalEmbedder("missing/path", max_length=8,
                            fallback_config=TINY_T5)
    acoustic = {"midi": jnp.zeros((1, 1, 8)), "beats": jnp.zeros((1, 1, 8))}
    out = emb({"caption": ["style: jazz"], "acoustic": acoustic,
               "name": ["song0"]})
    assert out["caption"].shape == (1, 8, 32)
    assert out["acoustic"] is acoustic
    assert out["name"] == ["song0"]


def test_text_vocal_musical_embedder_csep_split():
    emb = TextVocalMusicalEmbedder("missing/path", max_length=8,
                                   fallback_config=TINY_T5)
    out = emb({"caption": ["Style: pop<csep>Musical: fast tempo"],
               "acoustic": {}, "name": None})
    # dual-encode concat along sequence: 2 x max_length
    assert out["caption"].shape == (1, 16, 32)
    # halves differ (different text in each half)
    z = np.asarray(out["caption"])
    assert np.abs(z[:, :8] - z[:, 8:]).max() > 1e-6


def test_clap_text_embedder():
    emb = ClapTextEmbedder(None, max_length=8, text_model="missing",
                           fallback_config=TINY_BERT, d_proj=24)
    z = emb(["a happy tune"])
    assert z.shape == (1, 8, 24)


@pytest.mark.slow
def test_clap_flan_embedder_concat():
    emb = ClapFlanEmbedder(None, t5version="missing", max_length=8,
                           text_model="missing", d_proj=32,
                           fallback_config=TINY_T5)
    z = emb({"ori_caption": ["x"], "struct_caption": ["y"]})
    assert z.shape[1] == 16  # 8 clap + 8 t5 tokens


def test_projection_matches_torch():
    import torch

    params = _projection_params(jax.random.PRNGKey(1), 6, 4)
    x = np.random.RandomState(0).randn(3, 6).astype(np.float32)
    out = projection_apply(params, jnp.asarray(x))

    l1 = torch.nn.Linear(6, 4, bias=False)
    l2 = torch.nn.Linear(4, 4, bias=False)
    ln = torch.nn.LayerNorm(4)
    with torch.no_grad():
        l1.weight.copy_(torch.from_numpy(np.asarray(params["linear1"]).T))
        l2.weight.copy_(torch.from_numpy(np.asarray(params["linear2"]).T))
        e1 = l1(torch.from_numpy(x))
        e2 = l2(torch.nn.functional.gelu(e1))
        ref = ln(e1 + e2).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_class_embedder_and_rescaler():
    ce = ClassEmbedder(16, n_classes=10)
    out = ce({"class": np.array([1, 3])})
    assert out.shape == (2, 1, 16)

    sr = SpatialRescaler(n_stages=1, multiplier=0.5, in_channels=4,
                         out_channels=2)
    y = sr(jnp.zeros((1, 4, 8, 8)))
    assert y.shape == (1, 2, 4, 4)
