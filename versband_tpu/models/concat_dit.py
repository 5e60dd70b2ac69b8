"""ConcatDiT backbone family (legacy, capability parity).

Re-design of ``ldm/modules/diffusionmodules/concatDiT.py:93-726`` +
``ldm/modules/new_attention.py``: conditioning by TEMPORAL CONCATENATION —
the sequence fed to the transformer is ``[t_emb, caption_tokens,
(acoustic ++) x]`` with a learned position embedding; the conditioning prefix
is sliced off before the final projection.

The per-depth unit is a full ``TemporalTransformer`` (``concatDiT.py:117-160``):
GroupNorm(32) -> 1x1 conv in -> {LN -> self-attn -> LN -> second self-attn ->
LN -> conv-k9 GEGLU FFN, all residual} -> zero-init 1x1 conv out -> residual.

Variants:
  * ``ConcatDiT``        — single caption embedder (:161-223);
  * ``ConcatDiT2MLP``    — TWO caption embedder MLPs over the two halves of
    the caption token sequence (:225-291; the '2MLP' is two c-embedders, not
    an MLP FFN);
  * ``HybridDiT2MLP``    — codec-token conditioning: code ids embedded at
    ``hidden//2//codebooks``, conv+pool projected, CHANNEL-concatenated with
    the half-width projected latent; output keeps the latent half (:294-412);
  * ``HybridDiT2MLP2``   — ``cond_fuse`` selectable: ``concat_cut`` (as
    above) or ``concat_proj`` (full-width streams + fuse Linear) (:413-530);
  * ``ConcatOrderDiT``   — order embeddings ADDED to caption tokens per
    '|'-separated object (:531-642);
  * ``ConcatOrderDiT2``  — order TOKENS INSERTED before each '|' separator,
    padded to ``Tc + max_objs`` (:643-726).

All modules return ``(out, 0.0)`` so they slot into the same DiffusionWrapper
contract as the MoE backbones. Converter family: 'concat_dit'
(``versband_tpu/utils/torch_convert.py``).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from versband_tpu.nn import TimestepEmbedder, ConditionEmbedder, sdpa

Array = jax.Array
xavier = fnn.initializers.xavier_uniform()


class PositionEmbedding(fnn.Module):
    """Learned absolute positions, MODE_ADD (``new_attention.py:203-247``)."""

    num_embeddings: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        T = x.shape[1]
        table = self.param("weight", fnn.initializers.normal(0.02),
                           (self.num_embeddings, self.embedding_dim))
        return x + table[None, :T].astype(x.dtype)


class CrossAttention(fnn.Module):
    """Plain (self/cross) MHA (``new_attention.py:92-133``)."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, context: Array | None = None) -> Array:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = fnn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = fnn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = fnn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        B, T = x.shape[0], x.shape[1]
        Tk = ctx.shape[1]
        q = q.reshape(B, T, self.heads, self.dim_head)
        k = k.reshape(B, Tk, self.heads, self.dim_head)
        v = v.reshape(B, Tk, self.heads, self.dim_head)
        out = sdpa(q, k, v).reshape(B, T, inner)
        return fnn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class Conv1dFeedForward(fnn.Module):
    """conv-k9 GEGLU FFN over [B, T, C] (``new_attention.py:47-74``)."""

    dim: int
    mult: int = 4
    kernel_size: int = 9
    glu: bool = True
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * self.mult
        if self.glu:
            h = fnn.Conv(inner * 2, (self.kernel_size,), padding="SAME",
                         dtype=self.dtype, name="proj")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * fnn.gelu(gate, approximate=False)
        else:
            h = fnn.Conv(inner, (self.kernel_size,), padding="SAME",
                         dtype=self.dtype, name="proj")(x)
            h = fnn.gelu(h, approximate=False)
        return fnn.Conv(self.dim, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name="out")(h)


class BasicTemporalBlock(fnn.Module):
    """LN -> self-attn -> LN -> second self-attn -> LN -> conv GEGLU FFN,
    all residual (``concatDiT.py:93-115`` — attn2 runs without context, i.e.
    a second SELF attention)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        dh = self.dim // self.heads
        x = x + CrossAttention(self.dim, self.heads, dh, dtype=self.dtype,
                               name="attn1")(
            fnn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(self.dim, self.heads, dh, dtype=self.dtype,
                               name="attn2")(
            fnn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        x = x + Conv1dFeedForward(self.dim, dtype=self.dtype, name="ff")(
            fnn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


class TemporalTransformer(fnn.Module):
    """GroupNorm -> 1x1 conv -> BasicTemporalBlock(s) -> zero 1x1 conv ->
    residual (``concatDiT.py:117-160``). Operates on [B, T, C]."""

    dim: int
    heads: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = fnn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                          name="norm")(x)
        h = fnn.Conv(self.dim, (1,), dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTemporalBlock(self.dim, self.heads, dtype=self.dtype,
                                   name=f"transformer_blocks_{i}")(h)
        h = fnn.Conv(self.dim, (1,), kernel_init=fnn.initializers.zeros,
                     dtype=self.dtype, name="proj_out")(h)
        return h + x


class Conv1DFinalLayer(fnn.Module):
    """GroupNorm(16) + 1x1 conv head (``concatDiT.py:66-78``); [B,T,C] in,
    [B,T,out] out."""

    hidden_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        x = fnn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype,
                          name="norm_final")(x)
        return fnn.Conv(self.out_channels, (1,), dtype=self.dtype,
                        name="conv1d")(x)


def _caption_context(context: Any) -> Array:
    if isinstance(context, dict):
        return context.get("c_crossattn", context)
    return context


class _ConcatBase(fnn.Module):
    """Shared trunk: temporal concat -> pos emb -> TemporalTransformer blocks
    -> prefix slice -> Conv1DFinalLayer."""

    in_channels: int
    context_dim: int
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    max_len: int = 1000
    dtype: jnp.dtype = jnp.float32

    def _trunk(self, t_tok: Array, c_tok: Array, h: Array,
               final_width: int | None = None, cut_half: bool = False) -> Array:
        extra = 1 + c_tok.shape[1]
        h = jnp.concatenate([t_tok, c_tok, h], axis=1)
        h = PositionEmbedding(self.max_len, self.hidden_size,
                              dtype=self.dtype, name="pos_emb")(h)
        for i in range(self.depth):
            h = TemporalTransformer(self.hidden_size, self.num_heads,
                                    dtype=self.dtype, name=f"blocks_{i}")(h)
        h = h[:, extra:]
        if cut_half:  # keep the latent half of the channels (concatDiT.py:396)
            h = h[:, :, self.hidden_size // 2:]
        width = final_width or self.hidden_size
        out = Conv1DFinalLayer(width, self.in_channels, dtype=self.dtype,
                               name="final_layer")(h)
        return jnp.swapaxes(out, 1, 2)

    def _t_tok(self, t: Array) -> Array:
        return TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                name="t_embedder")(t)[:, None, :]


class ConcatDiT(_ConcatBase):
    """(x [B,C,T], t [B], context [B,Ty,ctx]) -> (out [B,C,T], 0.0)
    (``concatDiT.py:161-223``)."""

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        context = _caption_context(context)
        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))
        c_tok = ConditionEmbedder(self.hidden_size, gelu_tanh=True,
                                  dtype=self.dtype, name="c_embedder")(context)
        return self._trunk(self._t_tok(t), c_tok, h), jnp.float32(0.0)


class ConcatDiT2MLP(_ConcatBase):
    """Two caption embedders over the two halves of the token sequence
    (``concatDiT.py:225-291``: ``c1, c2 = context.chunk(2, dim=1)``)."""

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        context = _caption_context(context)
        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))
        c1, c2 = jnp.array_split(context, 2, axis=1)  # torch.chunk semantics
        c1 = ConditionEmbedder(self.hidden_size, gelu_tanh=True,
                               dtype=self.dtype, name="c1_embedder")(c1)
        c2 = ConditionEmbedder(self.hidden_size, gelu_tanh=True,
                               dtype=self.dtype, name="c2_embedder")(c2)
        c_tok = jnp.concatenate([c1, c2], axis=1)
        return self._trunk(self._t_tok(t), c_tok, h), jnp.float32(0.0)


class HybridDiT2MLP(_ConcatBase):
    """Codec-token conditioned variant (``concatDiT.py:294-412``).

    Code ids ``[B, codebooks, T]`` are offset per codebook (``id + q*code_num``,
    clamped at 3072), embedded at ``hidden//2//codebooks`` each and flattened
    to a ``hidden//2``-channel stream; ``code_proj`` = conv(k5) + LeakyReLU +
    AvgPool(2) downsamples to the latent rate. The latent is conv-projected to
    ``hidden//2`` channels and CHANNEL-concatenated with the code stream
    (after a +-2 frame length reconciliation); the trunk output keeps only the
    latent half of the channels before the final head.
    """

    code_num: int = 1024
    codebook_num: int = 3
    unit_upsample_rate: float = 1.0
    cond_fuse: str = "concat_cut"  # base class: fixed concat_cut behavior

    def _embed_codes(self, codes: Array, emb_dim: int, width: int) -> Array:
        """[B, Q, T] ids -> [B, T//2, width] projected+pooled code features."""
        codes = codes.astype(jnp.int32)
        offsets = self.code_num * jnp.arange(self.codebook_num)
        codes = codes + offsets[None, :, None]
        codes = jnp.minimum(codes, 3072)  # acoustic[acoustic > 3072] = 3072
        ce = fnn.Embed(self.code_num * self.codebook_num + 5, emb_dim,
                       dtype=self.dtype, name="code_embed")(codes)  # [B,Q,T,e]
        B, Q, T, e = ce.shape
        # transpose(2,3).flatten(1,2): [B, Q*e, T] channel stream
        ce = jnp.moveaxis(ce, 3, 2).reshape(B, Q * e, T)
        if self.unit_upsample_rate != 1.0:
            tgt = int(T * self.unit_upsample_rate)
            ce = jax.image.resize(ce, (B, Q * e, tgt), method="linear")
        # code_proj: conv k5 -> LeakyReLU -> AvgPool1d(2)
        ce = fnn.Conv(width, (5,), padding="SAME", dtype=self.dtype,
                      name="code_proj")(jnp.swapaxes(ce, 1, 2))
        ce = fnn.leaky_relu(ce, negative_slope=0.01)
        return fnn.avg_pool(ce, (2,), strides=(2,))  # [B, T', width]

    @staticmethod
    def _reconcile(acoustic: Array, T: int) -> Array:
        """+-2 frame length fix (``concatDiT.py:379-384``)."""
        Ta = acoustic.shape[1]
        if T > Ta:
            pad = jnp.repeat(acoustic[:, -1:, :], T - Ta, axis=1)
            return jnp.concatenate([acoustic, pad], axis=1)
        return acoustic[:, :T, :]

    def _run(self, x, t, context, fuse: str):
        codes = None
        if isinstance(context, dict):
            codes = context.get("c_concat")
            if isinstance(codes, dict):
                codes = codes.get("acoustic")
            context = context.get("c_crossattn", context)

        half = self.hidden_size // 2
        if fuse == "concat_cut":
            emb_dim, code_w, lat_w = half // self.codebook_num, half, half
        elif fuse == "concat_proj":
            emb_dim = self.hidden_size // self.codebook_num
            code_w = lat_w = self.hidden_size
        else:
            raise ValueError(f"unknown cond_fuse {fuse!r}")

        h = fnn.Conv(lat_w, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))  # [B, T, lat_w]
        acoustic = self._embed_codes(codes, emb_dim, code_w)
        acoustic = self._reconcile(acoustic, h.shape[1])
        h = jnp.concatenate([acoustic, h], axis=2)  # channel-wise concat
        if fuse == "concat_proj":
            h = fnn.Dense(self.hidden_size, dtype=self.dtype,
                          name="fuse_proj")(h)

        c_tok = ConditionEmbedder(self.hidden_size, gelu_tanh=True,
                                  dtype=self.dtype,
                                  name="caption_embedder")(context)
        out = self._trunk(self._t_tok(t), c_tok, h,
                          final_width=half if fuse == "concat_cut"
                          else self.hidden_size,
                          cut_half=fuse == "concat_cut")
        return out, jnp.float32(0.0)

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        return self._run(x, t, context, "concat_cut")


class HybridDiT2MLP2(HybridDiT2MLP):
    """``cond_fuse``-selectable variant (``concatDiT.py:413-530``):
    ``concat_cut`` = half-width code/latent streams, output channel cut;
    ``concat_proj`` = full-width streams + ``fuse_proj`` Linear(2h -> h)."""

    cond_fuse: str = "concat_cut"

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        return self._run(x, t, context, self.cond_fuse)


def _order_index_per_token(token_ids: Array) -> Tuple[Array, Array]:
    """Vectorized ``add_order_embedding`` index math (``concatDiT.py:575-597``).

    Returns (obj_index [B,Tc] int32, is_special [B,Tc] bool): obj_index[b,i] =
    number of '|' separators (BERT id 1064) before token i; special tokens
    (101 <start>, 102 <eos>, 0 <pad>, 1064 '|') receive no order embedding.
    """
    is_sep = token_ids == 1064
    special = (is_sep | (token_ids == 101) | (token_ids == 102)
               | (token_ids == 0))
    before = (jnp.cumsum(is_sep.astype(jnp.int32), axis=1)
              - is_sep.astype(jnp.int32))
    return before, special


class ConcatOrderDiT(_ConcatBase):
    """Order-conditioned ConcatDiT (``concatDiT.py:531-642``): caption token
    embeddings get a per-object ORDER embedding added — object k's tokens
    (segmented by '|' separators, BERT id 1064) receive
    ``order_embedding(orders[k])``.

    TPU-first deviation: ``context['orders']`` is a padded int array
    ``[B, max_objs]`` (the reference's ragged per-example Python lists are a
    host-side collate concern); the token->object index map is computed with
    vectorized cumsum/gather instead of Python loops.

    Context: ``{'token_embedding': [B,Tc,ctx], 'token_ids': [B,Tc] int,
    'orders': [B,max_objs] int}``.
    """

    num_orders: int = 100

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        token_embedding = context["token_embedding"]
        token_ids = context["token_ids"]
        orders = context["orders"].astype(jnp.int32)  # [B, max_objs]

        c = ConditionEmbedder(self.hidden_size, gelu_tanh=True,
                              dtype=self.dtype,
                              name="c_embedder")(token_embedding)  # [B,Tc,H]
        order_emb = fnn.Embed(self.num_orders, self.hidden_size,
                              dtype=self.dtype, name="order_embedding")(orders)
        obj_idx, special = _order_index_per_token(token_ids)
        obj_idx = jnp.minimum(obj_idx, orders.shape[1] - 1)
        per_token = jnp.take_along_axis(order_emb, obj_idx[..., None], axis=1)
        c = c + jnp.where(special[..., None], 0, per_token)

        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))
        return self._trunk(self._t_tok(t), c, h), jnp.float32(0.0)


class ConcatOrderDiT2(_ConcatBase):
    """Order-token variant (``concatDiT.py:643-726``): instead of adding order
    embeddings, an order TOKEN is inserted immediately before each '|'
    separator, and the caption stream is padded with the pad-order embedding
    (id ``max_objs_order`` = 100) to a fixed ``Tc + max_objs`` length.

    Fixed-shape construction: the output caption buffer starts as all
    pad-order embeddings plus one trash slot; token b,j scatters to slot
    ``j + #separators<=j`` and order token k to ``sep_pos_k + k`` — identical
    layout to the reference's Python ``list.insert`` loop without
    data-dependent shapes. ``orders``: padded ``[B, max_objs]`` int array.
    """

    max_objs: int = 10
    max_objs_order: int = 100

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        token_embedding = context["token_embedding"]
        token_ids = context["token_ids"]
        orders = context["orders"].astype(jnp.int32)  # [B, max_objs]

        c = ConditionEmbedder(self.hidden_size, gelu_tanh=True,
                              dtype=self.dtype,
                              name="c_embedder")(token_embedding)  # [B,Tc,H]
        B, Tc, H = c.shape

        embed = fnn.Embed(self.max_objs_order + 1, self.hidden_size,
                          dtype=self.dtype, name="order_embedding")
        order_emb = embed(jnp.minimum(orders, self.max_objs_order))
        pad_emb = embed(jnp.full((1, 1), self.max_objs_order, jnp.int32))

        is_sep = token_ids == 1064
        sep_incl = jnp.cumsum(is_sep.astype(jnp.int32), axis=1)  # seps <= j
        tok_pos = jnp.arange(Tc)[None, :] + sep_incl              # [B,Tc]
        sep_excl = sep_incl - is_sep.astype(jnp.int32)            # k of k-th sep

        # Fixed-shape scatter with a trash slot at index out_len: any write we
        # want to drop (non-separator order writes, overflow) lands there.
        out_len = Tc + self.max_objs
        buf = jnp.concatenate(
            [jnp.broadcast_to(pad_emb, (B, out_len, H)),
             jnp.zeros((B, 1, H), pad_emb.dtype)], axis=1).astype(self.dtype)
        batch = jnp.broadcast_to(jnp.arange(B)[:, None], (B, Tc))
        # caption tokens at j + #separators<=j
        tok_dst = jnp.where(tok_pos < out_len, tok_pos, out_len)
        buf = buf.at[batch, tok_dst].set(c)
        # order token k immediately before the k-th separator (sep_pos + k)
        ord_tok = jnp.take_along_axis(
            order_emb,
            jnp.minimum(sep_excl, self.max_objs - 1)[..., None], axis=1)
        ord_dst = jnp.where(is_sep & (tok_pos - 1 < out_len),
                            tok_pos - 1, out_len)
        buf = buf.at[batch, ord_dst].set(ord_tok)
        c = buf[:, :out_len]

        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))
        return self._trunk(self._t_tok(t), c, h), jnp.float32(0.0)
