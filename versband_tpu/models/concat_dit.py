"""ConcatDiT backbone family (legacy, capability parity).

Re-design of ``ldm/modules/diffusionmodules/concatDiT.py:161-726`` +
``ldm/modules/new_attention.py``: conditioning by TEMPORAL CONCATENATION —
the sequence fed to plain transformer blocks is ``[t_emb, caption_tokens,
(acoustic +) x]`` with a learned position embedding; the conditioning prefix
is sliced off before the final projection.

  * ``ConcatDiT``      — Conv1dFeedForward blocks (GEGLU, conv k9);
  * ``ConcatDiT2MLP``  — MLP (linear GEGLU) FFN variant (:225-291);
  * ``HybridDiT2MLP``  — adds codec-token conditioning: code ids embedded at
    ``hidden//2//codebooks`` each, concatenated and temporally ADDED to the
    projected latent before the concat (:294-412).

All jitted modules return ``(out, 0.0)`` so they slot into the same
DiffusionWrapper contract as the MoE backbones.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from versband_tpu.nn import TimestepEmbedder, ConditionEmbedder, sdpa

Array = jax.Array
xavier = fnn.initializers.xavier_uniform()


class PositionEmbedding(fnn.Module):
    """Learned absolute positions (``new_attention.py:203-247``)."""

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
    """Plain (self/cross) MHA (``new_attention.py:87-141``)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
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
    """conv-k9 GEGLU FFN over [B, T, C] (``new_attention.py:48-75``)."""

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


class MLPGEGLU(fnn.Module):
    """Linear GEGLU FFN (the '2MLP' variants)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * self.mult
        h = fnn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return fnn.Dense(self.dim, dtype=self.dtype,
                         name="out")(h * fnn.gelu(gate, approximate=False))


class TemporalBlock(fnn.Module):
    """LN -> self-attn -> LN -> FFN with residuals (the TemporalTransformer
    basic block)."""

    dim: int
    heads: int
    ffn: str = "conv"  # 'conv' | 'mlp'
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = fnn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.dim, heads=self.heads,
                               dim_head=self.dim // self.heads,
                               dtype=self.dtype, name="attn")(h)
        h = fnn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.ffn == "conv":
            x = x + Conv1dFeedForward(self.dim, dtype=self.dtype,
                                      name="ff")(h)
        else:
            x = x + MLPGEGLU(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class ConcatDiT(fnn.Module):
    """(x [B,C,T], t [B], context [B,Ty,ctx]) -> (out [B,C,T], 0.0)
    (``concatDiT.py:161-223``)."""

    in_channels: int
    context_dim: int
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    max_len: int = 1000
    ffn: str = "conv"
    dtype: jnp.dtype = jnp.float32

    def _conditioning_tokens(self, x, t, context):
        t_tok = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 name="t_embedder")(t)[:, None, :]
        c_tok = ConditionEmbedder(self.hidden_size, dtype=self.dtype,
                                  name="c_embedder")(context)
        return t_tok, c_tok

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        if isinstance(context, dict):
            context = context.get("c_crossattn", context)
        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))
        t_tok, c_tok = self._conditioning_tokens(x, t, context)
        extra = 1 + c_tok.shape[1]
        h = jnp.concatenate([t_tok, c_tok, h], axis=1)
        h = PositionEmbedding(self.max_len, self.hidden_size,
                              dtype=self.dtype, name="pos_emb")(h)
        for i in range(self.depth):
            h = TemporalBlock(self.hidden_size, self.num_heads, self.ffn,
                              dtype=self.dtype, name=f"blocks_{i}")(h)
        h = h[:, extra:]
        out = fnn.Conv(self.in_channels, (5,), padding="SAME",
                       kernel_init=fnn.initializers.zeros, dtype=self.dtype,
                       name="final_layer")(h)
        return jnp.swapaxes(out, 1, 2), jnp.float32(0.0)


class ConcatDiT2MLP(ConcatDiT):
    """MLP-FFN variant (``concatDiT.py:225-291``)."""

    ffn: str = "mlp"


class HybridDiT2MLP(fnn.Module):
    """Codec-token conditioned variant (``concatDiT.py:294-412``): code ids
    [B, codebooks, T] embedded (hidden//2//codebooks each), flattened, added
    to the projected latent; then the ConcatDiT temporal-concat scheme."""

    in_channels: int
    context_dim: int
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    max_len: int = 1000
    code_num: int = 1024
    codebook_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        codes = None
        if isinstance(context, dict):
            codes = context.get("c_concat")
            if isinstance(codes, dict):
                codes = codes.get("acoustic")
            context = context.get("c_crossattn", context)

        h = fnn.Conv(self.hidden_size, (5,), padding="SAME", dtype=self.dtype,
                     name="proj_in")(jnp.swapaxes(x, 1, 2))
        if codes is not None:
            emb_dim = self.hidden_size // 2 // self.codebook_num
            ce = fnn.Embed(self.code_num * self.codebook_num + 5, emb_dim,
                           dtype=self.dtype, name="code_embed")(
                codes.astype(jnp.int32))  # [B, Q, T, e]
            B, Q, T, e = ce.shape
            ce = jnp.swapaxes(ce, 1, 2).reshape(B, T, Q * e)
            ce = fnn.Dense(self.hidden_size, dtype=self.dtype,
                           name="code_proj")(ce)
            Tm = min(ce.shape[1], h.shape[1])
            h = h.at[:, :Tm].add(ce[:, :Tm]) if hasattr(h, "at") else h

        t_tok = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 name="t_embedder")(t)[:, None, :]
        c_tok = ConditionEmbedder(self.hidden_size, dtype=self.dtype,
                                  name="c_embedder")(context)
        extra = 1 + c_tok.shape[1]
        h = jnp.concatenate([t_tok, c_tok, h], axis=1)
        h = PositionEmbedding(self.max_len, self.hidden_size,
                              dtype=self.dtype, name="pos_emb")(h)
        for i in range(self.depth):
            h = TemporalBlock(self.hidden_size, self.num_heads, "mlp",
                              dtype=self.dtype, name=f"blocks_{i}")(h)
        out = fnn.Conv(self.in_channels, (5,), padding="SAME",
                       kernel_init=fnn.initializers.zeros, dtype=self.dtype,
                       name="final_layer")(h[:, extra:])
        return jnp.swapaxes(out, 1, 2), jnp.float32(0.0)
