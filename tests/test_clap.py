"""CLAP model: audio tower shapes, text/audio embedding spaces, zero-shot API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.text.clap import Cnn14, CLAP, CLAPWrapper, _clap_logmel

TINY_CNN = dict(sample_rate=16000, window_size=256, hop_size=128, mel_bins=64,
                fmin=50.0, fmax=7000.0, classes_num=10, out_emb=32)
TINY_BERT = dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                 intermediate_size=64, vocab_size=512)


def test_logmel_shapes_and_db_scale():
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000).astype(np.float32))
    mel = _clap_logmel(wav, 16000, 256, 128, 64, 50.0, 7000.0)
    assert mel.shape[0] == 2 and mel.shape[2] == 64
    assert float(mel.max()) < 60 and float(mel.min()) >= -100 - 1


@pytest.mark.slow
def test_cnn14_tower():
    m = Cnn14(**TINY_CNN)
    wav = jnp.zeros((1, 8000))
    params = m.init(jax.random.PRNGKey(0), wav)
    out = m.apply(params, wav)
    assert out["embedding"].shape == (1, 32)
    assert out["clipwise_output"].shape == (1, 10)
    assert (np.asarray(out["clipwise_output"]) >= 0).all()


@pytest.fixture(scope="module")
def clap():
    return CLAP(d_proj=24, text_model="missing", cnn_kwargs=TINY_CNN,
                fallback_config=TINY_BERT)


@pytest.mark.slow
def test_clap_embeddings_and_similarity(clap):
    wavs = np.random.RandomState(0).randn(2, 8000).astype(np.float32)
    a = clap.get_audio_embeddings(wavs)
    t = clap.get_text_embeddings(["a piano piece", "heavy drums"])
    assert a.shape == (2, 24) and t.shape == (2, 24)
    sims = clap.compute_similarity(a, t)
    assert sims.shape == (2, 2)
    assert np.isfinite(np.asarray(sims)).all()


@pytest.mark.slow
def test_clap_wrapper_zero_shot(clap):
    w = CLAPWrapper(None, d_proj=24, text_model="missing",
                    cnn_kwargs=TINY_CNN, fallback_config=TINY_BERT)
    probs = w.classify_audio(np.zeros(8000, np.float32),
                             ["quiet", "loud", "speech"])
    assert probs.shape == (3,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
