"""Core NN primitives for the Band-MOE DiT stack, TPU-first.

Re-designs (not translations) of the Lumina-style primitives the reference
uses (``ldm/modules/diffusionmodules/flag_large_dit_moe.py``): RMSNorm (:34-77),
adaLN ``modulate`` (:80-81), ``TimestepEmbedder`` (:96-133), ``ConditionEmbedder``
(:149-160), SwiGLU ``FeedForward`` with the 2/3*4d hidden rule (:434-485), RoPE via
complex multiply (:237-269, here the equivalent real-pair rotation), and the joint
self + zero-init tanh-gated cross ``Attention`` (:163-406).

All sequence tensors are ``[B, T, C]`` (feature-last — the native JAX/TPU layout).
Masks are ``[B, T]`` with 1 = valid. Attention replaces the reference's CUDA
flash-attn varlen unpadding with mask-aware fixed-shape SDPA (padded buckets),
which XLA fuses; a Pallas flash kernel is available via ``versband_tpu.ops``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn
import numpy as np

Array = jax.Array


class RMSNorm(fnn.Module):
    """y = x / sqrt(mean(x^2) + eps) * w, normalized in fp32."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", fnn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed.astype(x.dtype) * w.astype(x.dtype)).astype(self.dtype)


def modulate(x: Array, shift: Array, scale: Array) -> Array:
    """adaLN modulation: x * (1 + scale) + shift, with [B, C] conditioners."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """Sinusoidal embedding of (possibly fractional) timesteps ``[B] -> [B, dim]``.

    cos-first layout, matching ``flag_large_dit_moe.py:109-128``.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(fnn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, t: Array) -> Array:
        x = timestep_embedding(t, self.frequency_embedding_size).astype(self.dtype)
        x = fnn.Dense(self.hidden_size, dtype=self.dtype,
                      kernel_init=fnn.initializers.normal(0.02), name="fc1")(x)
        x = fnn.silu(x)
        x = fnn.Dense(self.hidden_size, dtype=self.dtype,
                      kernel_init=fnn.initializers.normal(0.02), name="fc2")(x)
        return x


class ConditionEmbedder(fnn.Module):
    """Caption projection MLP: Linear -> GELU -> Linear -> LayerNorm.

    ``gelu_tanh``: the concatDiT family uses GELU(approximate='tanh')
    (``concatDiT.py:86``) where the Lumina stack uses exact GELU.
    """

    hidden_size: int
    gelu_tanh: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        x = fnn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = fnn.gelu(x, approximate=self.gelu_tanh)
        x = fnn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)
        x = fnn.LayerNorm(dtype=self.dtype, name="ln")(x)
        return x


def swiglu_hidden_dim(hidden_dim: int, multiple_of: int = 256,
                      ffn_dim_multiplier: Optional[float] = None) -> int:
    """The Llama/Lumina SwiGLU hidden-size rule (``flag_large_dit_moe.py:461-468``)."""
    hidden_dim = int(2 * hidden_dim / 3)
    if ffn_dim_multiplier is not None:
        hidden_dim = int(ffn_dim_multiplier * hidden_dim)
    return multiple_of * ((hidden_dim + multiple_of - 1) // multiple_of)


class FeedForward(fnn.Module):
    """SwiGLU FFN: w2(silu(w1 x) * w3 x), no biases."""

    dim: int
    hidden_dim: int
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = swiglu_hidden_dim(self.hidden_dim, self.multiple_of, self.ffn_dim_multiplier)
        xavier = fnn.initializers.xavier_uniform()
        w1 = fnn.Dense(h, use_bias=False, dtype=self.dtype, kernel_init=xavier, name="w1")
        w2 = fnn.Dense(self.dim, use_bias=False, dtype=self.dtype, kernel_init=xavier, name="w2")
        w3 = fnn.Dense(h, use_bias=False, dtype=self.dtype, kernel_init=xavier, name="w3")
        return w2(fnn.silu(w1(x)) * w3(x))


def precompute_rope(
    dim: int,
    end: int,
    theta: float = 10000.0,
    rope_scaling_factor: float = 1.0,
    ntk_factor: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables ``[end, dim//2]`` — the real form of the reference's
    complex ``freqs_cis`` (``vocal2music_moe.py:436-475``) incl. ntk/rope scaling."""
    theta = theta * ntk_factor
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end, dtype=np.float64) / rope_scaling_factor
    ang = np.outer(t, freqs)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Rotate interleaved feature pairs of ``x`` ``[B, T, H, D]`` by position.

    Pair layout (x[2i], x[2i+1]) matches the reference's ``view_as_complex`` on the
    last dim (``flag_large_dit_moe.py:263-269``): out_even = a*cos - b*sin,
    out_odd = a*sin + b*cos. Computed in fp32.
    """
    dtype = x.dtype
    T = x.shape[1]
    if T > cos.shape[0]:
        raise ValueError(
            f"sequence length {T} exceeds the RoPE table ({cos.shape[0]}); "
            "increase the model's max_len")
    xf = x.astype(jnp.float32)
    a = xf[..., 0::2]
    b = xf[..., 1::2]
    c = cos[None, :T, None, :]
    s = sin[None, :T, None, :]
    out_a = a * c - b * s
    out_b = a * s + b * c
    out = jnp.stack([out_a, out_b], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def sdpa(q: Array, k: Array, v: Array, mask: Optional[Array] = None,
         scale: Optional[float] = None) -> Array:
    """Masked scaled-dot-product attention over ``[B, T, H, D]`` tensors.

    ``mask``: [B, Tk] with 1 = attendable. Softmax in fp32. Fixed shapes — XLA
    fuses this; for long sequences use the Pallas flash kernel in versband_tpu.ops.
    """
    dtype = q.dtype
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def attention(q: Array, k: Array, v: Array, mask: Optional[Array] = None,
              scale: Optional[float] = None, use_flash: bool = False) -> Array:
    """Dispatch between jnp SDPA and the Pallas flash kernel.

    ``use_flash`` assumes the mask (if any) is a contiguous padding prefix —
    exactly what the bucketed data pipeline produces — and converts it to
    per-example valid lengths for the kernel.
    """
    if use_flash:
        from versband_tpu.ops import flash_attention

        kv_len = None if mask is None else mask.astype(jnp.int32).sum(-1)
        return flash_attention(q, k, v, kv_len=kv_len, scale=scale)
    return sdpa(q, k, v, mask, scale)


class JointAttention(fnn.Module):
    """Self-attention with RoPE + optional zero-init tanh-gated cross-attention.

    The TPU re-design of ``flag_large_dit_moe.py:163-406``: one query projection
    serves both the self path (over x, with RoPE and x_mask) and the text
    cross path (over y, per-head tanh gate initialized to 0). GQA supported via
    ``n_kv_heads``. Instead of varlen unpadding, padded buckets + masks.
    ``use_flash`` routes both passes through the Pallas flash kernel.
    """

    dim: int
    n_heads: int
    n_kv_heads: Optional[int] = None
    qk_norm: bool = False
    y_dim: int = 0
    use_flash: bool = False
    # Lumina proportional attention for length extrapolation: softmax scale
    # sqrt(log_{base_seqlen}(T) / head_dim). The reference references the flag
    # but never defines it (a latent crash in its flash path,
    # ``flag_large_dit_moe.py:362-365`` / SURVEY.md §7.3 item 7); defined here
    # with default False.
    proportional_attn: bool = False
    base_seqlen: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Optional[Array],
        rope_cos: Array,
        rope_sin: Array,
        y: Optional[Array] = None,
        y_mask: Optional[Array] = None,
    ) -> Array:
        B, T, _ = x.shape
        n_kv = self.n_kv_heads or self.n_heads
        head_dim = self.dim // self.n_heads
        n_rep = self.n_heads // n_kv
        xavier = fnn.initializers.xavier_uniform()

        q = fnn.Dense(self.n_heads * head_dim, use_bias=False, dtype=self.dtype,
                      kernel_init=xavier, name="wq")(x)
        k = fnn.Dense(n_kv * head_dim, use_bias=False, dtype=self.dtype,
                      kernel_init=xavier, name="wk")(x)
        v = fnn.Dense(n_kv * head_dim, use_bias=False, dtype=self.dtype,
                      kernel_init=xavier, name="wv")(x)

        if self.qk_norm:
            q = fnn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = fnn.LayerNorm(dtype=self.dtype, name="k_norm")(k)

        q = q.reshape(B, T, self.n_heads, head_dim)
        k = k.reshape(B, T, n_kv, head_dim)
        v = v.reshape(B, T, n_kv, head_dim)

        q = apply_rope(q, rope_cos[:T], rope_sin[:T])
        k = apply_rope(k, rope_cos[:T], rope_sin[:T])
        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)

        scale = None
        if self.proportional_attn and self.base_seqlen and T > 1:
            scale = math.sqrt(
                math.log(T, self.base_seqlen) / head_dim)
        out = attention(q, k, v, x_mask, scale=scale, use_flash=self.use_flash)

        if self.y_dim > 0 and y is not None:
            ky = fnn.Dense(n_kv * head_dim, use_bias=False, dtype=self.dtype,
                           kernel_init=xavier, name="wk_y")(y)
            if self.qk_norm:
                ky = fnn.LayerNorm(dtype=self.dtype, name="ky_norm")(ky)
            vy = fnn.Dense(n_kv * head_dim, use_bias=False, dtype=self.dtype,
                           kernel_init=xavier, name="wv_y")(y)
            Ty = y.shape[1]
            ky = ky.reshape(B, Ty, n_kv, head_dim)
            vy = vy.reshape(B, Ty, n_kv, head_dim)
            if n_rep > 1:
                ky = jnp.repeat(ky, n_rep, axis=2)
                vy = jnp.repeat(vy, n_rep, axis=2)
            gate = self.param("gate", fnn.initializers.zeros, (self.n_heads,), jnp.float32)
            # cross-attention keys are short (text, ~80 tokens): XLA's fused
            # SDPA beats a Pallas dispatch there, so the flash path is
            # self-attention only.
            out_y = sdpa(q, ky, vy, y_mask)
            out = out + out_y * jnp.tanh(gate).astype(out.dtype)[None, None, :, None]

        out = out.reshape(B, T, self.n_heads * head_dim)
        return fnn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         kernel_init=xavier, name="wo")(out)
