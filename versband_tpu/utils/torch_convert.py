"""Torch -> JAX checkpoint converter.

Converts reference PyTorch checkpoints (Lightning ``.ckpt`` / plain
state-dict ``.pt``) into the flax param trees this framework consumes —
required for every weight-parity claim (SURVEY.md §7.2 step 3).

Tensor layout rules (torch -> flax):
  * Conv1d          weight [O, I, K]    -> kernel [K, I, O]
  * Conv2d          weight [O, I, H, W] -> kernel [H, W, I, O]
  * ConvTranspose1d weight [I, O, K]    -> kernel [K, I, O]
  * Linear          weight [O, I]       -> kernel [I, O]
  * Embedding       weight              -> embedding (as is)
  * Group/LayerNorm weight/bias         -> scale/bias
  * weight-norm (weight_g [O,1,..], weight_v like conv) -> kernel_g [O],
    kernel_v (conv layout)

Name maps are per model family (``FAMILY_RULES``): ordered regex rewrites from
the reference's module paths to this framework's flax paths. Band-MOE DiT
conversion additionally STACKS the reference's per-expert ModuleDict weights
(``caption_experts.{i}.w{n}``) into the stacked ``[E, d, h]`` tensors the TPU
einsum experts use (models/dit.py).

T5/BERT towers need no rules here — load them with transformers'
``from_pretrained(..., from_pt=True)``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from versband_tpu.utils.checkpoint import save_npz_params, unflatten_params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "generator", "model_gen"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: np.asarray(v.detach().float().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


# --- layout converters -----------------------------------------------------

def conv1d_w(w):  # [O, I, K] -> [K, I, O]
    return np.transpose(w, (2, 1, 0))


def conv2d_w(w):  # [O, I, H, W] -> [H, W, I, O]
    return np.transpose(w, (2, 3, 1, 0))


def convT1d_w(w):  # [I, O, K] -> [K, I, O]
    return np.transpose(w, (2, 0, 1))


def linear_w(w):  # [O, I] -> [I, O]
    return np.transpose(w)


def identity(w):
    return w


# --- family rules ------------------------------------------------------------
# (regex, replacement, layout) applied to each torch key; first match wins.
# layout: one of the converters above, or 'auto' (rank-based conv/linear), or
# 'convT' for transposed convs.

Rule = Tuple[str, str, Any]

_VAE_BLOCK = [
    (r"norm(\d|_out|)\.weight$", lambda m: None, None),  # handled generically
]


def _auto_layout(key: str, w: np.ndarray, transposed: bool = False):
    if key.endswith(("scale", "bias", "embedding", "kernel_g", "logvar", "loc")):
        return w
    if key.endswith("kernel") or key.endswith("kernel_v"):
        if w.ndim == 3:
            return convT1d_w(w) if transposed else conv1d_w(w)
        if w.ndim == 4:
            return conv2d_w(w)
        if w.ndim == 2:
            return linear_w(w)
    return w


def _rename(key: str, rules: List[Rule]) -> Optional[Tuple[str, bool]]:
    """Returns (flax path, is_transposed_conv) or None to drop."""
    for pattern, repl, flag in rules:
        if re.match(pattern, key):
            if repl is None:
                return None
            new = re.sub(pattern, repl, key)
            return new, flag == "convT"
    # default: dots -> slashes, weight->kernel / norm weight->scale
    return None


def _std_suffix(key: str) -> str:
    """Rewrite trailing torch param names to flax conventions (works whether
    the path separator is still '.' or already '/')."""
    key = re.sub(r"[./]weight_g$", "/kernel_g", key)
    key = re.sub(r"[./]weight_v$", "/kernel_v", key)
    key = re.sub(r"[./]weight$", "/kernel", key)
    key = re.sub(r"[./]bias$", "/bias", key)
    return key.replace(".", "/")


VAE_RULES: List[Rule] = [
    # norms: GroupNorm weight -> scale
    (r"(encoder|decoder)\.(down|up)\.(\d+)\.(block|attn)\.(\d+)\.(norm\d?|norm)\.weight$",
     r"\1/\2_\3_\4_\5/\6/scale", None),
    (r"(encoder|decoder)\.(down|up)\.(\d+)\.(block|attn)\.(\d+)\.(norm\d?|norm)\.bias$",
     r"\1/\2_\3_\4_\5/\6/bias", None),
    (r"(encoder|decoder)\.(down|up)\.(\d+)\.(block|attn)\.(\d+)\.(.+)$",
     r"\1/\2_\3_\4_\5/\6", None),
    (r"(encoder|decoder)\.(down)\.(\d+)\.downsample\.(.+)$",
     r"\1/down_\3_downsample/\4", None),
    (r"(encoder|decoder)\.(up)\.(\d+)\.upsample\.(.+)$",
     r"\1/up_\3_upsample/\4", None),
    (r"(encoder|decoder)\.mid\.(block_\d|attn_\d)\.(norm\d?|norm)\.weight$",
     r"\1/mid_\2/\3/scale", None),
    (r"(encoder|decoder)\.mid\.(block_\d|attn_\d)\.(norm\d?|norm)\.bias$",
     r"\1/mid_\2/\3/bias", None),
    (r"(encoder|decoder)\.mid\.(block_\d|attn_\d)\.(.+)$",
     r"\1/mid_\2/\3", None),
    (r"(encoder|decoder)\.norm_out\.weight$", r"\1/norm_out/scale", None),
    (r"(encoder|decoder)\.norm_out\.bias$", r"\1/norm_out/bias", None),
    (r"(encoder|decoder)\.(.+)$", r"\1/\2", None),
    (r"(quant_conv|post_quant_conv)\.(.+)$", r"\1/\2", None),
    (r"loss\..*$", None, None),  # loss module converted separately if needed
]

HIFIGAN_RULES: List[Rule] = [
    (r"conv_pre\.(.+)$", r"conv_pre/\1", None),
    (r"conv_post\.(.+)$", r"conv_post/\1", None),
    # BigVGAN nests each upsampler in a one-element ModuleList (ups.i.0)
    (r"ups\.(\d+)\.0\.(.+)$", r"ups_\1/\2", "convT"),
    (r"ups\.(\d+)\.(.+)$", r"ups_\1/\2", "convT"),
    # resblocks.{i*num_kernels+j} -> resblocks_{i}_{j} needs num_kernels; the
    # flat index is kept here and re-split in convert_state_dict via context.
    (r"resblocks\.(\d+)\.convs1\.(\d+)\.(.+)$", r"resblocks@\1/convs1_\2/\3", None),
    (r"resblocks\.(\d+)\.convs2\.(\d+)\.(.+)$", r"resblocks@\1/convs2_\2/\3", None),
    (r"resblocks\.(\d+)\.convs\.(\d+)\.(.+)$", r"resblocks@\1/convs_\2/\3", None),
    # BigVGAN AMP activations
    (r"resblocks\.(\d+)\.activations\.(\d+)\.act\.(alpha|beta)$",
     r"resblocks@\1/ACT_\2/\3", None),
    (r"activation_post\.act\.(alpha|beta)$", r"activation_post/\1", None),
    # NSF variant (modules/hifigan_nsf.py): harmonic source + noise branches
    (r"m_source\.l_linear\.(.+)$", r"m_source/l_linear/\1", None),
    (r"noise_convs\.(\d+)\.(.+)$", r"noise_convs_\1/\2", None),
]

DIT_RULES: List[Rule] = [
    (r"midi_embedding\.weight$", "midi_embedding/embedding", None),
    (r"beats_embedding\.weight$", "beats_embedding/embedding", None),
    (r"(midi|beats)_proj\.0\.(.+)$", r"\1_proj/conv/\2", None),
    (r"final_proj\.(.+)$", r"final_proj/\1", None),
    (r"proj_in\.(.+)$", r"proj_in/\1", None),
    (r"t_embedder\.mlp\.0\.(.+)$", r"t_embedder/fc1/\1", None),
    (r"t_embedder\.mlp\.2\.(.+)$", r"t_embedder/fc2/\1", None),
    (r"c_embedder\.mlp\.0\.(.+)$", r"c_embedder/fc1/\1", None),
    (r"c_embedder\.mlp\.2\.(.+)$", r"c_embedder/fc2/\1", None),
    (r"c_embedder\.norm\.weight$", "c_embedder/ln/scale", None),
    (r"c_embedder\.norm\.bias$", "c_embedder/ln/bias", None),
    (r"cap_embedder\.0\.weight$", "cap_embedder_norm/scale", None),
    (r"cap_embedder\.0\.bias$", "cap_embedder_norm/bias", None),
    (r"cap_embedder\.1\.(.+)$", r"cap_embedder/\1", None),
    (r"layers\.(\d+)\.attention\.(wq|wk|wv|wo|wk_y|wv_y)\.(.+)$",
     r"blocks_\1/attention/\2/\3", None),
    (r"layers\.(\d+)\.attention\.gate$", r"blocks_\1/attention/gate", None),
    # RMSNorm params are literally named "weight" in flax too — the W_
    # sentinel shields them from the generic weight->kernel suffix rewrite
    (r"layers\.(\d+)\.attention_norm\.weight$",
     r"blocks_\1/attention_norm/W_", None),
    (r"layers\.(\d+)\.attention_y_norm\.weight$",
     r"blocks_\1/attention_y_norm/W_", None),
    (r"layers\.(\d+)\.ffn_norm\.weight$", r"blocks_\1/ffn_norm/W_", None),
    (r"layers\.(\d+)\.adaLN_modulation\.1\.(.+)$",
     r"blocks_\1/adaLN_modulation/\2", None),
    # Band-MOE internals (experts handled by the stacker below)
    (r"layers\.(\d+)\.feed_forward\.(caption|acoustic|freq)_experts\.(\d+)\.(w\d)\.weight$",
     r"blocks_\1/feed_forward/\2_experts@\3/\4", None),
    (r"layers\.(\d+)\.feed_forward\.caption_gating_network\.(.+)$",
     r"blocks_\1/feed_forward/caption_gate/\2", None),
    (r"layers\.(\d+)\.feed_forward\.acoustic_gating_network\.(.+)$",
     r"blocks_\1/feed_forward/acoustic_gate/\2", None),
    (r"layers\.(\d+)\.feed_forward\.high_level_gating_network\.(.+)$",
     r"blocks_\1/feed_forward/high_level_gate/\2", None),
    # nn.MultiheadAttention packs qkv into in_proj_weight/bias — split below
    (r"layers\.(\d+)\.feed_forward\.cross_attention\.in_proj_(weight|bias)$",
     r"blocks_\1/feed_forward/cross_attention/IN_PROJ_\2", None),
    (r"layers\.(\d+)\.feed_forward\.cross_attention\.out_proj\.(.+)$",
     r"blocks_\1/feed_forward/cross_attention/wo/\2", None),
    (r"layers\.(\d+)\.feed_forward\.cross_attention\.(.+)$",
     r"blocks_\1/feed_forward/cross_attention/\2", None),
    (r"final_layer\.adaLN_modulation\.1\.(.+)$",
     r"final_layer/adaLN_modulation/\1", None),
    (r"final_layer\.linear\.(.+)$", r"final_layer/linear/\1", None),
    (r"freqs_cis$", None, None),  # recomputed
]

CONCAT_DIT_RULES: List[Rule] = [
    (r"t_embedder\.mlp\.0\.(.+)$", r"t_embedder/fc1/\1", None),
    (r"t_embedder\.mlp\.2\.(.+)$", r"t_embedder/fc2/\1", None),
    # ConditionEmbedder: mlp = [Linear, GELU, Linear, LayerNorm]
    (r"(c|c1|c2|caption)_embedder\.mlp\.0\.(.+)$", r"\1_embedder/fc1/\2", None),
    (r"(c|c1|c2|caption)_embedder\.mlp\.2\.(.+)$", r"\1_embedder/fc2/\2", None),
    (r"(c|c1|c2|caption)_embedder\.mlp\.3\.weight$", r"\1_embedder/ln/scale", None),
    (r"(c|c1|c2|caption)_embedder\.mlp\.3\.bias$", r"\1_embedder/ln/bias", None),
    (r"pos_emb\.weight$", "pos_emb/W_", None),
    (r"order_embedding\.weight$", "order_embedding/embedding", None),
    (r"code_embed\.weight$", "code_embed/embedding", None),
    (r"code_proj\.0\.(.+)$", r"code_proj/\1", None),
    (r"fuse_proj\.(.+)$", r"fuse_proj/\1", None),
    (r"proj_in\.(.+)$", r"proj_in/\1", None),
    # TemporalTransformer internals
    (r"blocks\.(\d+)\.norm\.weight$", r"blocks_\1/norm/scale", None),
    (r"blocks\.(\d+)\.norm\.bias$", r"blocks_\1/norm/bias", None),
    (r"blocks\.(\d+)\.(proj_in|proj_out)\.(.+)$", r"blocks_\1/\2/\3", None),
    (r"blocks\.(\d+)\.transformer_blocks\.(\d+)\.norm(\d)\.weight$",
     r"blocks_\1/transformer_blocks_\2/norm\3/scale", None),
    (r"blocks\.(\d+)\.transformer_blocks\.(\d+)\.norm(\d)\.bias$",
     r"blocks_\1/transformer_blocks_\2/norm\3/bias", None),
    (r"blocks\.(\d+)\.transformer_blocks\.(\d+)\.(attn\d)\.to_out\.0\.(.+)$",
     r"blocks_\1/transformer_blocks_\2/\3/to_out/\4", None),
    (r"blocks\.(\d+)\.transformer_blocks\.(\d+)\.(attn\d)\.(to_[qkv])\.(.+)$",
     r"blocks_\1/transformer_blocks_\2/\3/\4/\5", None),
    (r"blocks\.(\d+)\.transformer_blocks\.(\d+)\.ff\.net\.0\.proj\.(.+)$",
     r"blocks_\1/transformer_blocks_\2/ff/proj/\3", None),
    (r"blocks\.(\d+)\.transformer_blocks\.(\d+)\.ff\.net\.2\.(.+)$",
     r"blocks_\1/transformer_blocks_\2/ff/out/\3", None),
    (r"final_layer\.norm_final\.weight$", "final_layer/norm_final/scale", None),
    (r"final_layer\.norm_final\.bias$", "final_layer/norm_final/bias", None),
    (r"final_layer\.conv1d\.(.+)$", r"final_layer/conv1d/\1", None),
]

PWG_RULES: List[Rule] = [
    (r"first_conv\.(.+)$", r"first_conv/\1", None),
    (r"upsample_net\.conv_in\.(.+)$", r"upsample_net/conv_in/\1", None),
    # up_layers = [Stretch2d, Conv2d] per scale -> conv index (i-1)//2;
    # torch Conv2d weight [1,1,fk,2s+1] (H=freq, W=time) maps to our
    # (time, freq, 1, 1) NHWC stencil — special-cased below.
    (r"upsample_net\.upsample\.up_layers\.(\d+)\.weight$",
     r"upsample_net/upsample/UPCONV@\1", None),
    (r"conv_layers\.(\d+)\.(conv|conv1x1_aux|conv1x1_out|conv1x1_skip)\.(.+)$",
     r"conv_layers_\1/\2/\3", None),
    (r"last_conv_layers\.1\.(.+)$", r"last_conv_0/\1", None),
    (r"last_conv_layers\.3\.(.+)$", r"last_conv_1/\1", None),
    (r"pitch_embed\.weight$", "pitch_embed/embedding", None),
    (r"c_proj\.(.+)$", r"c_proj/\1", None),
]

CLAP_RULES: List[Rule] = [
    # torchlibrosa STFT/mel buffers are recomputed, BERT tower rides via
    # export_clap_bert -> transformers from_pretrained(from_pt=True)
    (r"(spectrogram_extractor|logmel_extractor)\..*$", None, None),
    (r"caption_encoder\.base\..*$", None, None),
    # Cnn14 BN layers arrive pre-folded (fold_torch_batchnorm) as affine
    # weight/bias pairs -> the flax modules' bn*_scale/bn*_bias params
    (r"audio_encoder\.base\.bn0\.weight$", "audio_encoder/base/bn0_scale",
     None),
    (r"audio_encoder\.base\.bn0\.bias$", "audio_encoder/base/bn0_bias", None),
    (r"audio_encoder\.base\.(conv_block\d)\.(bn\d)\.weight$",
     r"audio_encoder/base/\1/\2_scale", None),
    (r"audio_encoder\.base\.(conv_block\d)\.(bn\d)\.bias$",
     r"audio_encoder/base/\1/\2_bias", None),
    (r"audio_encoder\.base\.(.+)$", r"audio_encoder/base/\1", None),
    (r"(audio|caption)_encoder\.projection\.layer_norm\.weight$",
     r"\1_encoder/projection/layer_norm/scale", None),
    (r"(audio|caption)_encoder\.projection\.layer_norm\.bias$",
     r"\1_encoder/projection/layer_norm/bias", None),
    (r"(audio|caption)_encoder\.projection\.(.+)$",
     r"\1_encoder/projection/\2", None),
    (r"logit_scale$", "logit_scale", None),
]

FAMILY_RULES = {"vae": VAE_RULES, "hifigan": HIFIGAN_RULES,
                "bigvgan": HIFIGAN_RULES, "dit": DIT_RULES,
                "concat_dit": CONCAT_DIT_RULES, "pwg": PWG_RULES,
                "clap": CLAP_RULES}


def fold_torch_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Collapse torch (weight_g, weight_v) pairs into plain weights.

    Torch weight_norm groups over dim 0 (which is IN-channels for
    ConvTranspose1d) — folding at conversion time sidesteps the grouping
    mismatch with this framework's per-output-channel split; inference paths
    fold anyway (``remove_weight_norm`` in the reference)."""
    out = {}
    for key, w in sd.items():
        if key.endswith("weight_v"):
            base = key[: -len("weight_v")]
            g = sd[base + "weight_g"]
            axes = tuple(range(1, w.ndim))
            norm = np.sqrt((w ** 2).sum(axis=axes, keepdims=True) + 1e-12)
            out[base + "weight"] = (w / norm * g).astype(w.dtype)
        elif key.endswith("weight_g"):
            continue
        else:
            out[key] = w
    return out


def fold_torch_batchnorm(sd: Dict[str, np.ndarray],
                         eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Fold eval-mode BatchNorm (gamma, beta, running_mean, running_var) into
    a plain affine (weight, bias); drops running stats + num_batches_tracked.

    Eval ``nn.BatchNorm``: ``y = (x - rm) / sqrt(rv + eps) * gamma + beta``
    = ``x * s + b`` with ``s = gamma / sqrt(rv + eps)``, ``b = beta - rm * s``.
    BN layers are identified by the presence of a ``running_mean`` sibling, so
    LayerNorms (which also have weight/bias) are untouched."""
    bn = {k[: -len("running_mean")] for k in sd if k.endswith("running_mean")}
    out = {}
    for key, w in sd.items():
        pre = next((p for p in bn if key.startswith(p)
                    and key[len(p):] in ("weight", "bias", "running_mean",
                                         "running_var",
                                         "num_batches_tracked")), None)
        if pre is None:
            out[key] = w
            continue
        suffix = key[len(pre):]
        if suffix not in ("weight", "bias"):
            # affine=False BN (no gamma/beta): synthesize the affine pair
            # from the running stats instead of dropping the normalization
            if suffix == "running_mean" and pre + "weight" not in sd:
                s = (1.0 / np.sqrt(sd[pre + "running_var"] + eps))
                out[pre + "weight"] = s.astype(w.dtype)
                out[pre + "bias"] = (-w * s).astype(w.dtype)
            continue
        s = sd[pre + "weight"] / np.sqrt(sd[pre + "running_var"] + eps)
        out[key] = (s if suffix == "weight"
                    else sd[pre + "bias"] - sd[pre + "running_mean"] * s
                    ).astype(w.dtype)
    return out


def convert_state_dict(sd: Dict[str, np.ndarray], family: str,
                       num_resblock_kernels: int = 3) -> Dict[str, Any]:
    """Convert a torch state dict to a flax {'params': ...} tree (weight norm
    folded)."""
    sd = fold_torch_weight_norm(sd)
    if family == "clap":  # Cnn14's BatchNorms are eval-only -> fold to affine
        sd = fold_torch_batchnorm(sd)
    rules = FAMILY_RULES[family]
    flat: Dict[str, np.ndarray] = {}
    experts: Dict[str, Dict[int, np.ndarray]] = {}
    for key, w in sd.items():
        hit = _rename(key, rules)
        if hit is None:
            std = _std_suffix(key)
            # unmatched keys pass through with standard suffix rewrites
            if any(re.match(p, key) and r is None for p, r, _ in rules):
                continue
            flat[std] = _auto_layout(std, w)
            continue
        new, transposed = hit
        new = _std_suffix(new).replace("/W_", "/weight")
        if "@" in new:
            if "resblocks@" in new:
                # flat index i*num_kernels + j -> resblocks_{i}_{j}
                m = re.match(r"(.*)resblocks@(\d+)/(.+)", new)
                idx = int(m.group(2))
                i, j = divmod(idx, num_resblock_kernels)
                new = f"{m.group(1)}resblocks_{i}_{j}/{m.group(3)}"
                if "/ACT_" in new:
                    # Activation1d index within AMPBlock: acts1_{k}/acts2_{k}
                    m2 = re.match(r"(.*)/ACT_(\d+)/(alpha|beta)", new)
                    a_idx = int(m2.group(2))
                    k, which = divmod(a_idx, 2)
                    name = f"acts1_{k}" if which == 0 else f"acts2_{k}"
                    new = f"{m2.group(1)}/{name}/{m2.group(3)}"
                flat[new] = _auto_layout(new, w, transposed)
                continue
            m = re.match(r"(.+_experts)@(\d+)/(w\d)", new)
            if m:
                stack_key = f"{m.group(1)}/{m.group(3)}"
                experts.setdefault(stack_key, {})[int(m.group(2))] = linear_w(w)
                continue
            m = re.match(r"(.*)UPCONV@(\d+)$", new)
            if m:  # PWG upsample Conv2d: [1,1,fk,2s+1] -> (2s+1, fk, 1, 1)
                j = (int(m.group(2)) - 1) // 2
                flat[f"{m.group(1)}conv_{j}"] = np.transpose(w, (3, 2, 0, 1))
                continue
        flat[new] = _auto_layout(new, w, transposed)

    for stack_key, parts in experts.items():
        order = sorted(parts)
        flat[stack_key] = np.stack([parts[i] for i in order])  # [E, in, out]

    # split packed nn.MultiheadAttention in_proj into wq/wk/wv
    for key in [k for k in list(flat) if "/IN_PROJ_" in k]:
        w = flat.pop(key)
        base, kind = key.rsplit("/IN_PROJ_", 1)
        parts3 = np.split(w, 3, axis=0)  # torch packs [3d, ...] q,k,v
        for name, part in zip(("wq", "wk", "wv"), parts3):
            if kind.startswith("kernel") or kind == "weight":
                flat[f"{base}/{name}/kernel"] = linear_w(part)
            else:
                flat[f"{base}/{name}/bias"] = part

    return {"params": unflatten_params(flat)}


def convert_melgan_state_dict(sd: Dict[str, np.ndarray], num_scales: int = 3,
                              stacks: int = 3) -> Dict[str, Any]:
    """MelGAN generator conversion (``models/melgan.py:18-192``).

    The reference packs everything into one flat ``nn.Sequential`` whose
    indices depend on the config, so the map is computed rather than
    regex-matched. Non-causal default layout:
    ``[pad, conv_in] + per scale: [act, convT] + stacks x [ResidualStack]``
    then ``[act, pad, conv_out, tanh]``. ResidualStack params live at
    ``.stack.2`` (dilated conv), ``.stack.4`` (1x1) and ``.skip_layer``.
    """
    sd = fold_torch_weight_norm(sd)
    index_map: Dict[int, Tuple[str, bool]] = {1: ("conv_in", False)}
    for i in range(num_scales):
        base = 2 + i * (2 + stacks)
        index_map[base + 1] = (f"ups_{i}", True)
        for j in range(stacks):
            index_map[base + 2 + j] = (f"stack_{i}_{j}", False)
    final = 2 + num_scales * (2 + stacks)
    index_map[final + 2] = ("conv_out", False)

    flat: Dict[str, np.ndarray] = {}
    for key, w in sd.items():
        m = re.match(r"melgan\.(\d+)\.(.+)$", key)
        if not m:
            continue
        idx, rest = int(m.group(1)), m.group(2)
        if idx not in index_map:
            continue
        name, transposed = index_map[idx]
        rest = (rest.replace("stack.2.", "conv_dilated.")
                .replace("stack.4.", "conv_1x1.")
                .replace("skip_layer.", "shortcut."))
        new = _std_suffix(f"{name}/{rest}")
        flat[new] = _auto_layout(new, w, transposed)
    return {"params": unflatten_params(flat)}


def export_clap_bert(sd: Dict[str, np.ndarray], out_dir: str,
                     tokenizer_src: Optional[str] = None) -> str:
    """Extract the CLAP checkpoint's BERT caption tower
    (``caption_encoder.base.*``, loaded via ``AutoModel`` in
    ``CLAP/clap.py:46``) into an HF model directory that
    ``FlaxBertModel.from_pretrained(out_dir, from_pt=True)`` — i.e. this
    framework's ``_FrozenBertTower`` — can ingest offline. The BertConfig is
    inferred from tensor shapes."""
    import json
    import os

    import torch

    prefix = "caption_encoder.base."
    tower = {k[len(prefix):]: torch.from_numpy(np.asarray(v))
             for k, v in sd.items() if k.startswith(prefix)}
    if not tower:
        raise ValueError("no caption_encoder.base.* keys in state dict")
    emb = tower["embeddings.word_embeddings.weight"]
    hidden = emb.shape[1]
    layers = 1 + max(int(m.group(1)) for k in tower
                     if (m := re.match(r"encoder\.layer\.(\d+)\.", k)))
    inter = tower[
        "encoder.layer.0.intermediate.dense.weight"].shape[0]
    # BERT convention is 64-dim heads (base 768->12, large 1024->16,
    # small 384->6); only fall back to 12 for non-multiple-of-64 widths
    heads = hidden // 64 if hidden % 64 == 0 else \
        (12 if hidden % 12 == 0 else max(1, hidden // 64))
    cfg = dict(architectures=["BertModel"], model_type="bert",
               hidden_size=int(hidden), vocab_size=int(emb.shape[0]),
               num_hidden_layers=int(layers), num_attention_heads=int(heads),
               intermediate_size=int(inter),
               max_position_embeddings=int(
                   tower["embeddings.position_embeddings.weight"].shape[0]),
               type_vocab_size=int(
                   tower["embeddings.token_type_embeddings.weight"].shape[0]))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    torch.save(tower, os.path.join(out_dir, "pytorch_model.bin"))
    # The checkpoint carries no tokenizer; without vocab files in out_dir the
    # consumer (_FrozenBertTower) would silently hash-tokenize against real
    # weights. Pull the reference tokenizer (CLAP config.yml: text_model
    # bert-base-uncased) from the local HF cache when available.
    try:
        from transformers import AutoTokenizer

        tok_src = tokenizer_src or "bert-base-uncased"
        tok = AutoTokenizer.from_pretrained(tok_src, local_files_only=True)
        tok.save_pretrained(out_dir)
    except Exception:
        import warnings

        warnings.warn(
            f"no tokenizer files exported to {out_dir} "
            "(bert-base-uncased not in the local HF cache and no "
            "tokenizer_src given); place vocab.txt there or caption "
            "tokenization will fall back to hashing", stacklevel=2)
    return out_dir


def convert_checkpoint(torch_path: str, out_path: str, family: str,
                       bert_out: Optional[str] = None, **kw) -> None:
    sd = load_torch_state_dict(torch_path)
    tree = convert_state_dict(sd, family, **kw)
    save_npz_params(out_path, tree)
    if bert_out:
        export_clap_bert(sd, bert_out)
        print(f"exported BERT caption tower -> {bert_out}")
    print(f"converted {len(sd)} tensors -> {out_path}")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser("torch->jax checkpoint converter")
    p.add_argument("torch_ckpt")
    p.add_argument("out_npz")
    p.add_argument("--family", required=True, choices=sorted(FAMILY_RULES))
    p.add_argument("--num_resblock_kernels", type=int, default=3)
    p.add_argument("--bert_out", default=None,
                   help="also export the CLAP BERT caption tower (family "
                        "'clap' only) as an HF model dir")
    a = p.parse_args(argv)
    kw = dict(num_resblock_kernels=a.num_resblock_kernels)
    if a.family == "clap":
        kw = dict(bert_out=a.bert_out)
    convert_checkpoint(a.torch_ckpt, a.out_npz, a.family, **kw)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
