"""Conditioning encoders — the prompt side of the framework.

Re-designs of ``ldm/modules/encoders/modules.py``:
  * ``FlanT5Embedder``      <- FrozenFLANEmbedder (:70-97)
  * ``TextVocalEmbedder``   <- FrozenTextVocalEmbedder (:194-233) — the SHIPPED
    cond stage: frozen T5 encoder on captions, acoustic dict passed through
  * ``TextVocalMusicalEmbedder`` <- FrozenTextVocalMusicalEmbedder (:236-294),
    ``<csep>``-split caption/prompt dual-encode + seq concat. (The reference
    aliases ``caption = prompt = []`` so both halves land in one list — an
    obvious bug; here the two halves are kept separate as intended.)
  * ``ClapTextEmbedder``    <- FrozenCLAPEmbedder (:99-138) — CLAP BERT tower +
    per-token Projection
  * ``ClapFlanEmbedder``    <- FrozenCLAPFLANEmbedder (:140-191)
  * ``ClassEmbedder``, ``SpatialRescaler`` (:20-59)

TPU/offline design: the transformer towers are flax (``FlaxT5EncoderModel`` /
``FlaxBertModel``) jitted once; weights load from a local HF checkpoint dir
(the reference ships ``useful_ckpts/flan-t5-large`` the same way). With no
checkpoint available the towers are built RANDOM-INIT from a config — correct
shapes/dtypes for development and tests — and tokenization falls back to a
deterministic hashing tokenizer.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

Array = jax.Array


class HashTokenizer:
    """Deterministic fallback tokenizer (offline dev/test only): stable token
    ids via md5 of whitespace words, padded/truncated to max_length."""

    def __init__(self, vocab_size: int = 32128, pad_id: int = 0):
        self.vocab_size = vocab_size
        self.pad_id = pad_id

    def __call__(self, text, max_length: int = 77, **kw):
        import hashlib

        if isinstance(text, str):
            text = [text]
        ids = np.full((len(text), max_length), self.pad_id, np.int32)
        for i, t in enumerate(text):
            words = t.lower().split()[: max_length - 1]
            for j, w in enumerate(words):
                h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                ids[i, j] = 2 + h % (self.vocab_size - 2)
            ids[i, len(words)] = 1  # eos
        return {"input_ids": ids}


def _local_exists(version: str) -> bool:
    return os.path.isdir(version) and os.path.exists(
        os.path.join(version, "config.json"))


class _FrozenT5Tower:
    """Jitted frozen FLAN-T5/T5 encoder with offline fallbacks."""

    # tiny default config for random-init fallback (dev/test)
    FALLBACK = dict(d_model=1024, d_ff=2816, d_kv=64, num_heads=16,
                    num_layers=2, vocab_size=32128)

    def __init__(self, version: str = "google/flan-t5-large",
                 max_length: int = 77, fallback_config: Optional[dict] = None):
        from transformers import FlaxT5EncoderModel, T5Config

        self.max_length = max_length
        self.tokenizer = None
        if _local_exists(version):
            from transformers import AutoTokenizer

            try:
                self.tokenizer = AutoTokenizer.from_pretrained(version)
            except Exception:
                self.tokenizer = None
            try:
                self.model = FlaxT5EncoderModel.from_pretrained(version)
            except Exception:
                try:  # torch-only local dir (pytorch_model.bin)
                    self.model = FlaxT5EncoderModel.from_pretrained(
                        version, from_pt=True)
                except Exception:
                    self.model = None
        else:
            self.model = None
        if self.model is None:
            cfg = T5Config(**{**self.FALLBACK, **(fallback_config or {})})
            self.model = FlaxT5EncoderModel(cfg)
        elif self.tokenizer is None:
            # real weights + hashed token ids = silently meaningless
            # embeddings; make the mismatch loud (same guard as the BERT tower)
            import warnings

            warnings.warn(
                f"loaded T5 weights from {version} but found no tokenizer "
                "files there; falling back to HashTokenizer, so caption "
                "embeddings will NOT match the reference. Place the "
                "tokenizer files (spiece.model / tokenizer.json) in that "
                "directory.", stacklevel=2)
        if self.tokenizer is None:
            self.tokenizer = HashTokenizer(self.model.config.vocab_size)
        self.params = self.model.params
        module = self.model.module

        @jax.jit
        def encode(params, input_ids):
            return module.apply({"params": params}, input_ids=input_ids,
                                attention_mask=jnp.ones_like(input_ids)
                                ).last_hidden_state

        self._encode = encode

    def tokenize(self, text: Sequence[str]) -> np.ndarray:
        if isinstance(self.tokenizer, HashTokenizer):
            return self.tokenizer(list(text), self.max_length)["input_ids"]
        enc = self.tokenizer(list(text), truncation=True,
                             max_length=self.max_length, padding="max_length",
                             return_tensors="np")
        return enc["input_ids"]

    def __call__(self, text: Sequence[str]) -> Array:
        return self._encode(self.params, jnp.asarray(self.tokenize(text)))


class FlanT5Embedder:
    """text list -> [B, max_length, d_model] (``modules.py:70-97``)."""

    def __init__(self, version: str = "google/flan-t5-large", device=None,
                 max_length: int = 77, freeze: bool = True, **kw):
        self.tower = _FrozenT5Tower(version, max_length,
                                    kw.get("fallback_config"))

    def __call__(self, text) -> Array:
        return self.tower(text)

    def encode(self, text) -> Array:
        return self(text)


class TextVocalEmbedder:
    """The shipped cond stage (``modules.py:194-233``): cond dict in, cond dict
    out with caption replaced by frozen-T5 hidden states."""

    def __init__(self, version: str = "google/t5-v1_1-large", device=None,
                 max_length: int = 77, freeze: bool = True, **kw):
        self.tower = _FrozenT5Tower(version, max_length,
                                    kw.get("fallback_config"))
        self.max_length = max_length

    def __call__(self, cond: Dict[str, Any]) -> Dict[str, Any]:
        z = self.tower(cond["caption"])
        return {"caption": z, "acoustic": cond["acoustic"],
                "name": cond.get("name")}

    def encode(self, cond):
        return self(cond)


class TextVocalMusicalEmbedder(TextVocalEmbedder):
    """``<csep>``-split dual encode, concat along sequence (``modules.py:236-294``)."""

    def __call__(self, cond: Dict[str, Any]) -> Dict[str, Any]:
        captions, prompts = [], []
        for line in cond["caption"]:
            head, _, tail = line.partition("<csep>")
            captions.append(head)
            prompts.append(tail)
        z = jnp.concatenate([self.tower(captions), self.tower(prompts)], axis=1)
        return {"caption": z, "acoustic": cond["acoustic"],
                "name": cond.get("name")}


class _FrozenBertTower:
    """Jitted frozen BERT tower for the CLAP caption encoder."""

    FALLBACK = dict(hidden_size=768, num_hidden_layers=2,
                    num_attention_heads=12, intermediate_size=1024,
                    vocab_size=30522)

    def __init__(self, text_model: str = "bert-base-uncased",
                 max_length: int = 77, fallback_config: Optional[dict] = None):
        from transformers import BertConfig, FlaxBertModel

        self.max_length = max_length
        self.tokenizer = None
        self.model = None
        if _local_exists(text_model):
            from transformers import AutoTokenizer

            try:
                self.tokenizer = AutoTokenizer.from_pretrained(text_model)
            except Exception:
                pass
            try:
                self.model = FlaxBertModel.from_pretrained(text_model)
            except Exception:
                try:  # torch-only local dir (e.g. export_clap_bert output)
                    self.model = FlaxBertModel.from_pretrained(
                        text_model, from_pt=True)
                except Exception:
                    pass
        if self.model is None:
            cfg = BertConfig(**{**self.FALLBACK, **(fallback_config or {})})
            self.model = FlaxBertModel(cfg)
        elif self.tokenizer is None:
            # real weights + hashed token ids = silently meaningless
            # embeddings; make the mismatch loud
            import warnings

            warnings.warn(
                f"loaded BERT weights from {text_model} but found no "
                "tokenizer files there; falling back to HashTokenizer, so "
                "caption embeddings will NOT match the reference. Export "
                "tokenizer files into that directory (see "
                "torch_convert.export_clap_bert).", stacklevel=2)
        if self.tokenizer is None:
            self.tokenizer = HashTokenizer(self.model.config.vocab_size)
        self.params = self.model.params
        module = self.model.module

        @jax.jit
        def encode(params, input_ids):
            return module.apply({"params": params}, input_ids=input_ids,
                                attention_mask=jnp.ones_like(input_ids)
                                ).last_hidden_state

        self._encode = encode

    def tokenize(self, text):
        if isinstance(self.tokenizer, HashTokenizer):
            return self.tokenizer(list(text), self.max_length)["input_ids"]
        enc = self.tokenizer(list(text), truncation=True,
                             max_length=self.max_length, padding="max_length",
                             return_tensors="np")
        return enc["input_ids"]

    def __call__(self, text) -> Array:
        return self._encode(self.params, jnp.asarray(self.tokenize(text)))


def _projection_params(key, d_in: int, d_out: int):
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / np.sqrt(d_in)
    s2 = 1.0 / np.sqrt(d_out)
    return {
        "linear1": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -s1, s1),
        "linear2": jax.random.uniform(k2, (d_out, d_out), jnp.float32, -s2, s2),
        "ln_scale": jnp.ones((d_out,)), "ln_bias": jnp.zeros((d_out,)),
    }


def projection_apply(params, x: Array) -> Array:
    """CLAP Projection: ln(l1(x) + drop(l2(gelu(l1(x))))) (``CLAP/clap.py:8-20``),
    eval mode (no dropout)."""
    e1 = x @ params["linear1"]
    e2 = jax.nn.gelu(e1, approximate=False) @ params["linear2"]
    h = e1 + e2
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    return (h - mu) / jnp.sqrt(var + 1e-5) * params["ln_scale"] + params["ln_bias"]


class ClapTextEmbedder:
    """CLAP caption tower, per-token projection (``modules.py:99-138``)."""

    def __init__(self, weights_path: Optional[str] = None, freeze: bool = True,
                 device=None, max_length: int = 77,
                 text_model: str = "bert-base-uncased",
                 transformer_embed_dim: int = 768, d_proj: int = 1024, **kw):
        self.tower = _FrozenBertTower(text_model, max_length,
                                      kw.get("fallback_config"))
        d_in = self.tower.model.config.hidden_size
        self.proj = _projection_params(jax.random.PRNGKey(0), d_in, d_proj)
        if weights_path and os.path.exists(weights_path):
            self._load_clap_weights(weights_path)

    def _load_clap_weights(self, path: str):
        """Load converted CLAP weights (npz via versband_tpu.utils.torch_convert)."""
        from versband_tpu.utils.checkpoint import load_npz_params

        tree = load_npz_params(path) if path.endswith(".npz") else None
        if tree is None:
            return
        tree = tree.get("params", tree)
        if "caption_encoder" in tree and "projection" in tree["caption_encoder"]:
            p = tree["caption_encoder"]["projection"]
            self.proj = {
                "linear1": jnp.asarray(p["linear1"]["kernel"]),
                "linear2": jnp.asarray(p["linear2"]["kernel"]),
                "ln_scale": jnp.asarray(p["layer_norm"]["scale"]),
                "ln_bias": jnp.asarray(p["layer_norm"]["bias"]),
            }

    def encode(self, text) -> Array:
        z = self.tower(text)
        return projection_apply(self.proj, z)

    def __call__(self, text) -> Array:
        return self.encode(text)


class ClapFlanEmbedder:
    """CLAP(ori_caption) ++ T5(struct_caption) along sequence
    (``modules.py:140-191``)."""

    def __init__(self, weights_path: Optional[str] = None,
                 t5version: str = "google/t5-v1_1-large", freeze: bool = True,
                 device=None, max_length: int = 77, **kw):
        self.clap = ClapTextEmbedder(weights_path, max_length=max_length, **kw)
        self.t5 = _FrozenT5Tower(t5version, max_length,
                                 kw.get("fallback_config"))

    def encode(self, text: Dict[str, List[str]]) -> Array:
        z = self.clap.encode(text["ori_caption"])
        z2 = self.t5(text["struct_caption"])
        return jnp.concatenate([z, z2], axis=1)

    def __call__(self, text) -> Array:
        return self.encode(text)


class ClassEmbedder:
    """Class-id embedding (``modules.py:20-32``)."""

    def __init__(self, embed_dim: int, n_classes: int = 1000,
                 key: str = "class", seed: int = 0):
        self.key = key
        self.table = jax.random.normal(
            jax.random.PRNGKey(seed), (n_classes, embed_dim)) * 0.02

    def __call__(self, batch: Dict[str, Any], key: Optional[str] = None) -> Array:
        c = jnp.asarray(batch[key or self.key])[:, None]
        return self.table[c]


class SpatialRescaler:
    """n_stages x scale-factor resize + optional 1x1 remap (``modules.py:34-59``)."""

    def __init__(self, n_stages: int = 1, method: str = "bilinear",
                 multiplier: float = 0.5, in_channels: int = 3,
                 out_channels: Optional[int] = None, bias: bool = False,
                 seed: int = 0):
        self.n_stages = n_stages
        self.method = method
        self.multiplier = multiplier
        self.remap = None
        if out_channels is not None:
            self.remap = jax.random.normal(
                jax.random.PRNGKey(seed),
                (1, 1, in_channels, out_channels)) * (1.0 / np.sqrt(in_channels))

    def __call__(self, x: Array) -> Array:
        # x: [B, C, H, W]
        for _ in range(self.n_stages):
            B, C, H, W = x.shape
            x = jax.image.resize(
                x, (B, C, int(H * self.multiplier), int(W * self.multiplier)),
                method=self.method)
        if self.remap is not None:
            x = jax.lax.conv_general_dilated(
                x.transpose(0, 2, 3, 1), self.remap, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).transpose(0, 3, 1, 2)
        return x
