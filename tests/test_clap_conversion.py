"""CLAP weight-conversion goldens (VERDICT r2 item 5).

A tiny torch replica of the reference CLAP (``CLAP/clap.py:8-100`` +
``CLAP/audio.py:13-178``: Cnn14 with real eval-mode BatchNorm2d running
stats, torch.stft front end, both Projections, logit_scale) is converted via
``convert_state_dict(family='clap')`` and must match this framework's flax
CLAP tower ≤1e-4.  Also pins the BERT/T5 torch->flax weight hand-off used by
the shipped conditioning (``export_clap_bert`` -> ``from_pretrained`` and the
flan-t5 ``from_pt=True`` path).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from versband_tpu.dsp.mel import mel_filterbank  # noqa: E402
from versband_tpu.text.clap import CLAP  # noqa: E402
from versband_tpu.text.embedders import projection_apply  # noqa: E402
from versband_tpu.utils.torch_convert import (  # noqa: E402
    convert_state_dict, export_clap_bert, fold_torch_batchnorm)

SR, NFFT, HOP, MELS = 8000, 256, 64, 64
CHANNELS = (4, 4, 8, 8, 8, 16)
OUT_EMB, CLASSES, D_PROJ = 16, 5, 12
CNN_KW = dict(sample_rate=SR, window_size=NFFT, hop_size=HOP, mel_bins=MELS,
              fmin=50.0, fmax=3800.0, classes_num=CLASSES, out_emb=OUT_EMB,
              channels=CHANNELS)
TINY_BERT = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=48, vocab_size=211)


class TConvBlock(nn.Module):
    """audio.py:13-49 replica."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x, pool=(2, 2)):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        if pool != (1, 1):
            x = F.avg_pool2d(x, pool)
        return x


class TCnn14(nn.Module):
    """audio.py:107-178 replica; torch.stft front end (torchlibrosa
    Spectrogram == center/reflect/periodic-hann STFT)."""

    def __init__(self):
        super().__init__()
        self.bn0 = nn.BatchNorm2d(MELS)
        cins = (1,) + CHANNELS[:-1]
        for i, (ci, co) in enumerate(zip(cins, CHANNELS)):
            setattr(self, f"conv_block{i + 1}", TConvBlock(ci, co))
        self.fc1 = nn.Linear(CHANNELS[-1], OUT_EMB)
        self.fc_audioset = nn.Linear(OUT_EMB, CLASSES)
        fb = mel_filterbank(SR, NFFT, MELS, 50.0, 3800.0)
        self.register_buffer("melW", torch.from_numpy(fb.astype(np.float32)))

    def forward(self, wav):
        spec = torch.stft(wav, NFFT, HOP, win_length=NFFT,
                          window=torch.hann_window(NFFT, periodic=True),
                          center=True, pad_mode="reflect",
                          return_complex=True)
        power = spec.real ** 2 + spec.imag ** 2  # [B, F, T]
        mel = power.transpose(1, 2) @ self.melW.T  # [B, T, M]
        x = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
        x = x[:, None]                      # [B, 1, T, M]
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        for i in range(len(CHANNELS)):
            pool = (1, 1) if i == len(CHANNELS) - 1 else (2, 2)
            x = getattr(self, f"conv_block{i + 1}")(x, pool)
        x = torch.mean(x, dim=3)
        x = torch.amax(x, dim=2) + torch.mean(x, dim=2)
        x = F.relu(self.fc1(x))
        return {"embedding": x,
                "clipwise_output": torch.sigmoid(self.fc_audioset(x))}


class TProjection(nn.Module):
    """clap.py:8-20 replica (eval mode: dropout off)."""

    def __init__(self, d_in, d_out):
        super().__init__()
        self.linear1 = nn.Linear(d_in, d_out, bias=False)
        self.linear2 = nn.Linear(d_out, d_out, bias=False)
        self.layer_norm = nn.LayerNorm(d_out)

    def forward(self, x):
        e1 = self.linear1(x)
        return self.layer_norm(e1 + self.linear2(F.gelu(e1)))


def _randomize(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in mod.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.3)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)


@pytest.fixture(scope="module")
def torch_clap():
    torch.manual_seed(0)
    base = TCnn14()
    audio_proj = TProjection(OUT_EMB, D_PROJ)
    cap_proj = TProjection(TINY_BERT["hidden_size"], D_PROJ)
    _randomize(base, 1)
    _randomize(audio_proj, 2)
    _randomize(cap_proj, 3)
    base.eval(), audio_proj.eval(), cap_proj.eval()

    sd = {}
    for mod, prefix in ((base, "audio_encoder.base."),
                        (audio_proj, "audio_encoder.projection."),
                        (cap_proj, "caption_encoder.projection.")):
        for k, v in mod.state_dict().items():
            if k == "melW":
                continue
            sd[prefix + k] = v.numpy()
    sd["logit_scale"] = np.asarray(float(np.log(1 / 0.07)) + 0.1)
    # extractor buffers must be dropped by the rules
    sd["spectrogram_extractor.stft.conv_real.weight"] = np.zeros((NFFT, 1, 1))
    return base, audio_proj, cap_proj, sd


def test_clap_audio_tower_conversion_golden(torch_clap):
    base, audio_proj, _, sd = torch_clap
    tree = convert_state_dict(sd, "clap")
    clap = CLAP(d_proj=D_PROJ, text_model="missing", cnn_kwargs=CNN_KW,
                fallback_config=TINY_BERT)
    clap.load_converted(tree)

    wav = np.random.RandomState(0).randn(2, SR).astype(np.float32)
    with torch.no_grad():
        ref = audio_proj(base(torch.from_numpy(wav))["embedding"]).numpy()
    got = np.asarray(clap.get_audio_embeddings(wav))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert abs(clap.logit_scale - float(sd["logit_scale"])) < 1e-7


def test_clap_caption_projection_and_wrapper_roundtrip(torch_clap, tmp_path):
    _, _, cap_proj, sd = torch_clap
    from versband_tpu.utils.checkpoint import save_npz_params
    from versband_tpu.text.clap import CLAPWrapper

    npz = str(tmp_path / "clap.npz")
    save_npz_params(npz, convert_state_dict(sd, "clap"))
    w = CLAPWrapper(model_fp=npz, d_proj=D_PROJ, text_model="missing",
                    cnn_kwargs=CNN_KW, fallback_config=TINY_BERT)

    z = np.random.RandomState(1).randn(3, TINY_BERT["hidden_size"]) \
        .astype(np.float32)
    with torch.no_grad():
        ref = cap_proj(torch.from_numpy(z)).numpy()
    got = np.asarray(projection_apply(w.clap.text_proj, jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    # the audio tower weights really landed (not random init)
    assert w.clap.audio_params is not None
    p = w.clap.audio_params["params"]["base"]
    assert p["conv_block1"]["conv1"]["kernel"].shape == (3, 3, 1, CHANNELS[0])


def test_fold_torch_batchnorm_matches_eval_bn():
    bn = nn.BatchNorm2d(6)
    _randomize(bn, 9)
    bn.eval()
    sd = {"x.bn." + k: v.numpy() for k, v in bn.state_dict().items()}
    folded = fold_torch_batchnorm(sd)
    assert set(folded) == {"x.bn.weight", "x.bn.bias"}
    x = torch.randn(2, 6, 4, 4)
    with torch.no_grad():
        ref = bn(x).numpy()
    got = (x.numpy() * folded["x.bn.weight"][None, :, None, None]
           + folded["x.bn.bias"][None, :, None, None])
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_export_clap_bert_tower_parity(tmp_path):
    """caption_encoder.base.* (HF BERT inside the CLAP ckpt,
    ``CLAP/clap.py:46``) -> HF dir -> FlaxBertModel.from_pretrained(from_pt)
    must reproduce the torch tower ≤1e-4."""
    from transformers import BertConfig, BertModel, FlaxBertModel

    cfg = BertConfig(**TINY_BERT)
    torch.manual_seed(0)
    tm = BertModel(cfg).eval()
    sd = {"caption_encoder.base." + k: v.numpy()
          for k, v in tm.state_dict().items()}
    out_dir = export_clap_bert(sd, str(tmp_path / "bert"))

    fm = FlaxBertModel.from_pretrained(out_dir, from_pt=True)
    assert fm.config.num_hidden_layers == TINY_BERT["num_hidden_layers"]
    ids = np.random.RandomState(0).randint(
        0, TINY_BERT["vocab_size"], (2, 11))
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.ones(2, 11, dtype=torch.long)
                 ).last_hidden_state.numpy()
    got = np.asarray(fm(input_ids=jnp.asarray(ids),
                        attention_mask=jnp.ones((2, 11), jnp.int32)
                        ).last_hidden_state)
    # hidden states are O(1) post-LayerNorm; 5e-4 absolute covers the
    # XLA-vs-oneDNN float32 reduction-order drift
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)


def test_t5_from_pt_tower_parity(tmp_path):
    """Pins the flan-t5 weight path (``_FrozenT5Tower`` ->
    ``from_pretrained(..., from_pt=True)``, reference cond stage
    ``modules.py:194-233``): torch T5 encoder -> torch-only local dir ->
    flax tower, parity ≤1e-4."""
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(d_model=32, d_ff=48, d_kv=8, num_heads=4, num_layers=2,
                   vocab_size=128, dropout_rate=0.0)
    torch.manual_seed(0)
    tm = T5EncoderModel(cfg).eval()
    out_dir = str(tmp_path / "t5")
    tm.save_pretrained(out_dir, safe_serialization=False)

    from versband_tpu.text.embedders import _FrozenT5Tower

    tower = _FrozenT5Tower(out_dir, max_length=9)
    ids = np.random.RandomState(0).randint(0, 128, (2, 9))
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.ones(2, 9, dtype=torch.long)
                 ).last_hidden_state.numpy()
    got = np.asarray(tower._encode(tower.params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)
