"""Band-MOE flow-matching DiT backbone, TPU-native.

Re-design of the shipped ``TxtFlagLargeImprovedDiTV2`` backbone
(``ldm/modules/diffusionmodules/vocal2music_moe.py:36-520``): a depth-4, hidden-768
transformer over VAE latents with
  * adaLN-zero conditioning from timestep + pooled-caption embeddings,
  * joint self-attention (RoPE) + zero-init tanh-gated text cross-attention,
  * the **Band-MOE** FFN: caption cross-attention, a high-level gate on t_emb
    choosing between *caption* and *acoustic* expert groups, per-token Gumbel
    gates over 4 SwiGLU experts per group, plus frequency-band experts over
    hidden-channel partitions, with a usage*log(usage) load-balancing loss
    (``vocal2music_moe.py:95-185``).

TPU-first decisions:
  * Experts live as stacked weight tensors ``[E, d, h]`` and all experts are
    evaluated with one batched einsum then densely mixed — the reference loops a
    ModuleDict and masks (``vocal2music_moe.py:157-178``); at 4 experts/group,
    replicate-and-mask IS the fast TPU plan, and the stacked form shards over a
    'model'/'expert' mesh axis for EP.
  * Gumbel noise takes explicit PRNG keys (rng collection 'gumbel'); eval is
    deterministic hard argmax routing (reference: hard Gumbel at eval).
  * Temperature / lb-loss-weight annealing (x0.9999 per step, floors 0.3 / 0.01,
    ``vocal2music_moe.py:146-147,372,425-429``) is a pure function of the train
    ``step`` passed in — no mutable module state under jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

from versband_tpu.nn import (
    RMSNorm, modulate, TimestepEmbedder, ConditionEmbedder, FeedForward,
    precompute_rope, JointAttention, sdpa,
)

Array = jax.Array
xavier = fnn.initializers.xavier_uniform()


def anneal_temperature(step: Array | int, init: float = 2.0, decay: float = 0.9999,
                       floor: float = 0.3) -> Array:
    """tau(step) = max(floor, init * decay^step)."""
    return jnp.maximum(floor, init * decay ** jnp.asarray(step, jnp.float32))


def anneal_loss_weight(step: Array | int, decay: float = 0.9999, floor: float = 0.01) -> Array:
    return jnp.maximum(floor, decay ** jnp.asarray(step, jnp.float32))


def gumbel_softmax(logits: Array, temperature: Array | float, hard: bool,
                   key: Optional[jax.Array] = None) -> Array:
    """Gumbel-softmax with straight-through hard mode.

    With ``key=None`` no noise is added (deterministic): soft -> plain softmax,
    hard -> one-hot argmax (straight-through).
    """
    if key is not None:
        g = jax.random.gumbel(key, logits.shape, logits.dtype)
        y = (logits + g) / temperature
    else:
        y = logits / temperature
    y_soft = jax.nn.softmax(y, axis=-1)
    if hard:
        idx = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
        return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


class StackedSwiGLU(fnn.Module):
    """E parallel SwiGLU experts as stacked weights; one einsum per projection.

    Per-expert hidden dim follows the same 2/3 rule as FeedForward
    (``flag_large_dit_moe.py:461-468``). Output: ``[E, B, T, d]``.
    The leading expert axis is the EP sharding axis.

    Two structured fast paths share the same parameters:
      * ``idx`` (eval hard routing): tokens are sorted by their selected
        expert and run through ``lax.ragged_dot`` grouped matmuls — each token
        computes only its one expert (dropless, exact), a num_experts-fold
        FLOP cut over dense compute-and-mask.
      * ``band_diagonal`` (frequency-band experts): expert e only ever sees
        input channels of band e and only its band-e output channels survive
        the caller's mask, so the matmuls contract the extracted
        ``[band, h]`` weight slices instead of the zero-padded full width —
        algebraically identical, num_experts-fold fewer FLOPs.
    """

    num_experts: int
    dim: int
    hidden_dim: int
    multiple_of: int = 256
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, idx: Optional[Array] = None,
                 band_diagonal: bool = False) -> Array:
        from versband_tpu.nn.core import swiglu_hidden_dim

        h = swiglu_hidden_dim(self.hidden_dim, self.multiple_of)
        E, d = self.num_experts, self.dim
        w1 = self.param("w1", xavier, (E, d, h), jnp.float32).astype(self.dtype)
        w3 = self.param("w3", xavier, (E, d, h), jnp.float32).astype(self.dtype)
        w2 = self.param("w2", xavier, (E, h, d), jnp.float32).astype(self.dtype)

        if idx is not None:  # routed: x [B,T,d], idx [B,T] int -> [B,T,d]
            B, T, _ = x.shape
            xf = x.reshape(B * T, d)
            idf = idx.reshape(B * T)
            order = jnp.argsort(idf)
            xs = xf[order]
            gs = jnp.bincount(idf, length=E).astype(jnp.int32)
            a = jax.lax.ragged_dot(xs, w1, gs,
                                   preferred_element_type=jnp.float32)
            b = jax.lax.ragged_dot(xs, w3, gs,
                                   preferred_element_type=jnp.float32)
            inner = (fnn.silu(a) * b).astype(self.dtype)
            out = jax.lax.ragged_dot(inner, w2, gs,
                                     preferred_element_type=jnp.float32)
            inv = jnp.argsort(order)
            return out[inv].astype(self.dtype).reshape(B, T, d)

        if band_diagonal:  # x [B,T,d] -> per-band slices, concat back
            band = d // E
            B, T, _ = x.shape
            xb = jnp.moveaxis(x.reshape(B, T, E, band), 2, 0)  # [E,B,T,band]
            w1b = jnp.stack([w1[e, e * band:(e + 1) * band] for e in range(E)])
            w3b = jnp.stack([w3[e, e * band:(e + 1) * band] for e in range(E)])
            w2b = jnp.stack([w2[e, :, e * band:(e + 1) * band]
                             for e in range(E)])                # [E,h,band]
            a = jnp.einsum("ebtc,ech->ebth", xb, w1b,
                           preferred_element_type=jnp.float32)
            b = jnp.einsum("ebtc,ech->ebth", xb, w3b,
                           preferred_element_type=jnp.float32)
            inner = (fnn.silu(a) * b).astype(self.dtype)
            out = jnp.einsum("ebth,ehc->ebtc", inner, w2b,
                             preferred_element_type=jnp.float32)  # [E,B,T,band]
            return jnp.moveaxis(out.astype(self.dtype), 0, 2).reshape(B, T, d)

        if x.ndim == 3:  # shared input [B,T,d] -> broadcast to all experts
            a = jnp.einsum("btd,edh->ebth", x, w1, preferred_element_type=jnp.float32)
            b = jnp.einsum("btd,edh->ebth", x, w3, preferred_element_type=jnp.float32)
        else:  # per-expert input [E,B,T,d]
            a = jnp.einsum("ebtd,edh->ebth", x, w1, preferred_element_type=jnp.float32)
            b = jnp.einsum("ebtd,edh->ebth", x, w3, preferred_element_type=jnp.float32)
        inner = (fnn.silu(a) * b).astype(self.dtype)
        return jnp.einsum("ebth,ehd->ebtd", inner, w2,
                          preferred_element_type=jnp.float32).astype(self.dtype)


class CaptionCrossAttention(fnn.Module):
    """Standard biased MHA (q=x, kv=caption) — the MoE's nn.MultiheadAttention
    (``vocal2music_moe.py:79,119``)."""

    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, caption: Array) -> Array:
        B, T, _ = x.shape
        hd = self.dim // self.num_heads
        q = fnn.Dense(self.dim, dtype=self.dtype, name="wq")(x)
        k = fnn.Dense(self.dim, dtype=self.dtype, name="wk")(caption)
        v = fnn.Dense(self.dim, dtype=self.dtype, name="wv")(caption)
        q = q.reshape(B, T, self.num_heads, hd)
        k = k.reshape(B, caption.shape[1], self.num_heads, hd)
        v = v.reshape(B, caption.shape[1], self.num_heads, hd)
        out = sdpa(q, k, v).reshape(B, T, self.dim)
        return fnn.Dense(self.dim, dtype=self.dtype, name="wo")(out)


class BandMoE(fnn.Module):
    """The Band-MOE FFN block. Returns (output, load_balance_loss)."""

    dim: int
    hidden_dim: int
    num_experts: int = 4
    multiple_of: int = 256
    temperature_init: float = 2.0
    # Mathematically exact rewrites, measured on v5e at the shipped shapes
    # (B=2, T=752, E=4, d=768): sliced-weight freq experts win (~-12%% whole
    # sampler), but ragged_dot token routing LOSES to dense compute-and-mask
    # at 4 experts (sort/gather overhead > the 4x FLOP cut at this size) —
    # keep it off unless num_experts grows.
    eval_routed: bool = False
    freq_band_diagonal: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, t_emb: Array, caption: Array, acoustic: Array,
                 step: Array | int = 0, train: bool = False) -> Tuple[Array, Array]:
        B, T, d = x.shape
        E = self.num_experts
        temperature = anneal_temperature(step, self.temperature_init)
        hard = not train
        keys = {}
        if train and self.has_rng("gumbel"):
            base = self.make_rng("gumbel")
            keys = dict(zip(("hl", "cap", "ac"), jax.random.split(base, 3)))

        # (1) caption -> token-aligned caption features via cross-attention
        cap_feat = CaptionCrossAttention(self.dim, dtype=self.dtype,
                                         name="cross_attention")(x, caption)

        # (2) high-level group gate on t_emb: soft 2-way (caption vs acoustic)
        hl_logits = fnn.Dense(2, dtype=self.dtype, kernel_init=xavier,
                              name="high_level_gate")(t_emb)  # [B, 2]
        hl_probs = gumbel_softmax(hl_logits, 1.0, hard=False, key=keys.get("hl"))
        cap_mask = hl_probs[:, 0][:, None, None]   # [B,1,1]
        ac_mask = hl_probs[:, 1][:, None, None]

        # (3) per-token expert gates (Gumbel; hard one-hot at eval)
        cap_logits = fnn.Dense(E, dtype=self.dtype, kernel_init=xavier,
                               name="caption_gate")(cap_feat)  # [B,T,E]
        ac_logits = fnn.Dense(E, dtype=self.dtype, kernel_init=xavier,
                              name="acoustic_gate")(acoustic)
        cap_probs = gumbel_softmax(cap_logits, temperature, hard, keys.get("cap"))
        ac_probs = gumbel_softmax(ac_logits, temperature, hard, keys.get("ac"))

        # (4) expert evaluation + weighted mixture, masked by group gate.
        # Training (soft Gumbel weights): dense compute-and-mix — the fast TPU
        # plan at 4 experts. Eval (hard one-hot, no noise): each token runs
        # ONLY its argmax expert via sorted ragged_dot grouped matmuls —
        # exact same selected-expert math, num_experts-fold fewer FLOPs.
        cap_experts = StackedSwiGLU(E, self.dim, self.hidden_dim,
                                    self.multiple_of, dtype=self.dtype,
                                    name="caption_experts")
        ac_experts = StackedSwiGLU(E, self.dim, self.hidden_dim,
                                   self.multiple_of, dtype=self.dtype,
                                   name="acoustic_experts")
        if hard and self.eval_routed and self.is_initializing() is False:
            cap_sel = cap_experts(x, idx=jnp.argmax(cap_logits, axis=-1))
            ac_sel = ac_experts(x, idx=jnp.argmax(ac_logits, axis=-1))
            y = cap_sel * cap_mask + ac_sel * ac_mask
        else:
            cap_out = cap_experts(x)  # [E,B,T,d]
            ac_out = ac_experts(x)
            y = (jnp.einsum("ebtd,bte->btd", cap_out, cap_probs) * cap_mask
                 + jnp.einsum("ebtd,bte->btd", ac_out, ac_probs) * ac_mask)

        # (5) frequency-band experts: block-diagonal channel partition of y.
        # Expert e only sees band e's channels and only band e of its output
        # survives, so the sliced-weight path contracts the extracted
        # [band, h] slices directly; the masked-dense path is the same math
        # over zero-padded full-width inputs.
        freq_experts = StackedSwiGLU(E, self.dim, self.hidden_dim,
                                     self.multiple_of, dtype=self.dtype,
                                     name="freq_experts")
        if self.freq_band_diagonal:
            z = freq_experts(y, band_diagonal=True)
        else:
            band = d // E
            ch = jnp.arange(d)
            band_mask = ((ch[None, :] >= band * jnp.arange(E)[:, None])
                         & (ch[None, :] < band * (jnp.arange(E)[:, None] + 1))
                         ).astype(y.dtype)  # [E, d]
            y_banded = y[None] * band_mask[:, None, None, :]  # [E,B,T,d]
            z = jnp.einsum("ebtd,ed->btd", freq_experts(y_banded), band_mask)

        # (6) load-balancing loss over masked expert probs
        # (vocal2music_moe.py:95-115): usage_e = sum_n p_e,n * m_n / sum(all masks)
        cap_m = jnp.broadcast_to(cap_mask, (B, T, 1)).reshape(-1, 1)
        ac_m = jnp.broadcast_to(ac_mask, (B, T, 1)).reshape(-1, 1)
        probs_all = jnp.concatenate(
            [cap_probs.reshape(-1, E), ac_probs.reshape(-1, E)], axis=1)  # [N, 2E]
        masks_all = jnp.concatenate(
            [jnp.repeat(cap_m, E, 1), jnp.repeat(ac_m, E, 1)], axis=1)
        usage = (probs_all * masks_all).sum(0) / (masks_all.sum() + 1e-10)
        lb_loss = jnp.mean(usage * jnp.log(usage + 1e-10))

        return z, lb_loss


class FinalLayer(fnn.Module):
    """adaLN-zero final projection (``vocal2music_moe.py:268-291``)."""

    hidden_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        mod = fnn.Dense(2 * self.hidden_size, dtype=self.dtype,
                        kernel_init=fnn.initializers.zeros,
                        name="adaLN_modulation")(fnn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = fnn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          dtype=self.dtype, name="norm_final")(x)
        x = modulate(x, shift, scale)
        return fnn.Dense(self.out_channels, dtype=self.dtype,
                         kernel_init=fnn.initializers.zeros, name="linear")(x)


class TransformerBlock(fnn.Module):
    """adaLN(6-way) -> gated joint attention -> Band-MOE FFN; returns (h, lb_loss)."""

    dim: int
    n_heads: int
    y_dim: int
    num_experts: int = 4
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    norm_eps: float = 1e-5
    qk_norm: bool = False
    use_flash: bool = False
    moe_eval_routed: bool = False
    moe_freq_band_diagonal: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, x_mask, y, y_mask, rope_cos, rope_sin, adaln_input,
                 t_emb, caption, acoustic, step=0, train=False):
        mod = fnn.Dense(6 * self.dim, dtype=self.dtype,
                        kernel_init=fnn.initializers.zeros,
                        name="adaLN_modulation")(fnn.silu(adaln_input))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        attn_in = modulate(
            RMSNorm(self.dim, self.norm_eps, dtype=self.dtype, name="attention_norm")(x),
            shift_msa, scale_msa)
        y_n = RMSNorm(self.y_dim, self.norm_eps, dtype=self.dtype,
                      name="attention_y_norm")(y)
        h = x + gate_msa[:, None, :] * JointAttention(
            self.dim, self.n_heads, self.n_kv_heads, self.qk_norm, self.y_dim,
            use_flash=self.use_flash, dtype=self.dtype, name="attention",
        )(attn_in, x_mask, rope_cos, rope_sin, y_n, y_mask)

        ffn_in = modulate(
            RMSNorm(self.dim, self.norm_eps, dtype=self.dtype, name="ffn_norm")(h),
            shift_mlp, scale_mlp)
        out, lb = BandMoE(self.dim, self.dim, self.num_experts, self.multiple_of,
                          eval_routed=self.moe_eval_routed,
                          freq_band_diagonal=self.moe_freq_band_diagonal,
                          dtype=self.dtype, name="feed_forward")(
            ffn_in, t_emb, caption, acoustic, step=step, train=train)
        return h + gate_mlp[:, None, :] * out, lb


class ConvLeakyPool(fnn.Module):
    """conv(k5) -> LeakyReLU -> AvgPool1d(2): the midi/beats/code projection stem
    (``vocal2music_moe.py:330-350``)."""

    hidden_size: int
    kernel_size: int = 5
    pool: int = 2
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        x = fnn.Conv(self.hidden_size, (self.kernel_size,), padding="SAME",
                     dtype=self.dtype, name="conv")(x)
        x = fnn.leaky_relu(x, negative_slope=0.01)
        return fnn.avg_pool(x, (self.pool,), strides=(self.pool,))


class BandMoeDiT(fnn.Module):
    """The shipped vocal2music backbone (config ``configs/vocal2music.yaml:33-43``):
    in_ch 20, hidden 768, heads 8, depth 4, 4 experts, ori_dim 1024, context 768.

    Forward: ``(x [B,C,T_lat], t [B], context) -> (v [B,C,T_lat], lb_loss)``
    with ``context = {'c_concat': {'midi': [B,1,T], 'beats': [B,1,T]},
    'c_crossattn': caption [B,Ty,ori_dim]}`` — midi/beats are frame-level token
    ids at mel rate (2x the latent rate), embedded, conv-projected and 2x pooled
    to the latent rate; conditioning is injected additively (x = acoustic + x,
    ``vocal2music_moe.py:415``).
    """

    in_channels: int
    context_dim: int = 768
    hidden_size: int = 768
    depth: int = 4
    num_heads: int = 8
    max_len: int = 1500
    num_experts: int = 4
    ori_dim: int = 1024
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    norm_eps: float = 1e-5
    qk_norm: bool = False
    rope_scaling_factor: float = 1.0
    ntk_factor: float = 1.0
    midi_vocab: int = 130
    beats_vocab: int = 3
    use_flash: bool = False
    moe_eval_routed: bool = False
    moe_freq_band_diagonal: bool = True
    remat: bool = False  # jax.checkpoint each block (trade FLOPs for HBM)
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Dict[str, Any],
                 step: Array | int = 0, train: bool = False) -> Tuple[Array, Array]:
        # Conditioning encode is t-/x-independent. Samplers precompute it ONCE
        # outside the ODE scan (pass ``{"encode_only": True}`` to get the
        # encodings, then feed them back as ``{"c_encoded": ...}``) instead of
        # re-running the embedding/conv stems on all 25 steps.
        encoded = context.get("c_encoded") if isinstance(context, dict) else None
        encode_only = bool(isinstance(context, dict)
                           and context.get("encode_only"))

        if encoded is None:
            midi = context["c_concat"]["midi"]
            beats = context["c_concat"]["beats"]
            caption = context["c_crossattn"]
            if midi.ndim == 3:
                midi = midi[:, 0, :]
            if beats.ndim == 3:
                beats = beats[:, 0, :]

            midi_e = fnn.Embed(self.midi_vocab, self.hidden_size, dtype=self.dtype,
                               name="midi_embedding")(midi.astype(jnp.int32))
            beats_e = fnn.Embed(self.beats_vocab, self.hidden_size, dtype=self.dtype,
                                name="beats_embedding")(beats.astype(jnp.int32))
            midi_e = ConvLeakyPool(self.hidden_size, dtype=self.dtype, name="midi_proj")(midi_e)
            beats_e = ConvLeakyPool(self.hidden_size, dtype=self.dtype, name="beats_proj")(beats_e)
            acoustic = midi_e + beats_e  # [B, T_mel/2, H]
            acoustic = fnn.Conv(self.hidden_size, (1,), dtype=self.dtype,
                                name="final_proj")(acoustic)

            caption = ConditionEmbedder(self.hidden_size, dtype=self.dtype,
                                        name="c_embedder")(caption)  # [B,Ty,H]
            cap_pool = caption.mean(axis=1)  # all-ones cap mask in the shipped forward
            cap_emb = fnn.Dense(
                self.hidden_size, dtype=self.dtype, kernel_init=xavier, name="cap_embedder",
            )(fnn.LayerNorm(dtype=self.dtype, name="cap_embedder_norm")(cap_pool))
        else:
            acoustic = encoded["acoustic"]
            caption = encoded["caption"]
            cap_emb = encoded["cap_emb"]

        if encode_only:
            return {"acoustic": acoustic, "caption": caption,
                    "cap_emb": cap_emb}

        head_dim = self.hidden_size // self.num_heads
        cos_np, sin_np = precompute_rope(
            head_dim, self.max_len, rope_scaling_factor=self.rope_scaling_factor,
            ntk_factor=self.ntk_factor)
        rope_cos, rope_sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

        # latent in: [B, C, T] -> [B, T, H]
        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))

        # +-2 frame length reconciliation (vocal2music_moe.py:397-401)
        T = h.shape[1]
        Ta = acoustic.shape[1]
        if T > Ta:
            pad = jnp.repeat(acoustic[:, -1:, :], T - Ta, axis=1)
            acoustic = jnp.concatenate([acoustic, pad], axis=1)
        elif Ta > T:
            acoustic = acoustic[:, :T, :]

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype, name="t_embedder")(t)
        h = acoustic + h
        adaln_input = t_emb + cap_emb

        # static_argnums counts self at 0: `train` (a python bool) is arg 12
        block_cls = (fnn.remat(TransformerBlock, static_argnums=(12,))
                     if self.remat else TransformerBlock)
        lb_total = jnp.float32(0.0)
        for i in range(self.depth):
            h, lb = block_cls(
                self.hidden_size, self.num_heads, self.hidden_size,
                num_experts=self.num_experts, n_kv_heads=self.n_kv_heads,
                multiple_of=self.multiple_of, norm_eps=self.norm_eps,
                qk_norm=self.qk_norm, use_flash=self.use_flash,
                moe_eval_routed=self.moe_eval_routed,
                moe_freq_band_diagonal=self.moe_freq_band_diagonal,
                dtype=self.dtype, name=f"blocks_{i}",
            )(h, None, caption, None, rope_cos, rope_sin, adaln_input,
              t_emb, caption, acoustic, step, train)
            lb_total = lb_total + lb
        lb_loss = lb_total / self.depth * anneal_loss_weight(step)

        out = FinalLayer(self.hidden_size, self.in_channels, dtype=self.dtype,
                         name="final_layer")(h, adaln_input)
        return jnp.swapaxes(out, 1, 2), lb_loss
