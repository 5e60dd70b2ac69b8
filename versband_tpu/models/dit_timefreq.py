"""Time/Freq-MoE DiT — the base Lumina-style backbone variant.

Re-design of ``VideoFlagLargeDiT`` + its MoE
(``ldm/modules/diffusionmodules/flag_large_dit_moe.py:487-736``):
  * time experts: HARD routing by timestep quarter ``t // 250`` -> one of
    ``num_experts`` SwiGLU FFNs (hidden 4*dim rule, :543-547);
  * frequency experts: contiguous hidden-channel bands, each produced by its
    own FFN applied to the band-masked input (:523-532);
  * blocks: adaLN-zero + gated joint attention (same primitives as the
    Band-MOE DiT).

TPU form: stacked expert weights + one-hot routing through a single einsum
(replicate-and-mask — see models/dit.py rationale); the expert axis shards
over the mesh 'model' axis for EP.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from versband_tpu.models.dit import StackedSwiGLU, FinalLayer
from versband_tpu.nn import (
    RMSNorm, modulate, TimestepEmbedder, ConditionEmbedder, precompute_rope,
    JointAttention)

Array = jax.Array
xavier = fnn.initializers.xavier_uniform()


class TimeFreqMoE(fnn.Module):
    """Hard time-routed experts + frequency-band experts
    (``flag_large_dit_moe.py:487-532``). Output matches the reference's
    dense-loop-and-mask semantics via one-hot einsum mixing."""

    dim: int
    hidden_dim: int  # reference passes 4*dim
    num_experts: int = 4
    multiple_of: int = 256
    num_timesteps: int = 1000
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, t: Array) -> Array:
        E, d = self.num_experts, self.dim
        # time experts: route whole sequences by t // (num_timesteps / E)
        bucket = jnp.clip((t.astype(jnp.int32)
                           // (self.num_timesteps // E)), 0, E - 1)  # [B]
        onehot = jax.nn.one_hot(bucket, E, dtype=x.dtype)  # [B, E]
        time_out = StackedSwiGLU(E, d, self.hidden_dim, self.multiple_of,
                                 dtype=self.dtype, name="time_experts")(x)
        y = jnp.einsum("ebtd,be->btd", time_out, onehot)

        # frequency experts: contiguous channel bands
        band = d // E
        ch = jnp.arange(d)
        band_mask = ((ch[None, :] >= band * jnp.arange(E)[:, None])
                     & (ch[None, :] < band * (jnp.arange(E)[:, None] + 1))
                     ).astype(y.dtype)  # [E, d]
        y_banded = y[None] * band_mask[:, None, None, :]
        freq_out = StackedSwiGLU(E, d, self.hidden_dim, self.multiple_of,
                                 dtype=self.dtype, name="freq_experts")(y_banded)
        return jnp.einsum("ebtd,ed->btd", freq_out, band_mask)


class TimeFreqBlock(fnn.Module):
    dim: int
    n_heads: int
    num_experts: int = 4
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    norm_eps: float = 1e-5
    qk_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, y, rope_cos, rope_sin, adaln_input, t):
        mod = fnn.Dense(6 * self.dim, dtype=self.dtype,
                        kernel_init=fnn.initializers.zeros,
                        name="adaLN_modulation")(fnn.silu(adaln_input))
        (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp) = jnp.split(mod, 6, -1)
        attn_in = modulate(RMSNorm(self.dim, self.norm_eps, dtype=self.dtype,
                                   name="attention_norm")(x), s_msa, sc_msa)
        y_n = RMSNorm(self.dim, self.norm_eps, dtype=self.dtype,
                      name="attention_y_norm")(y)
        h = x + g_msa[:, None, :] * JointAttention(
            self.dim, self.n_heads, self.n_kv_heads, self.qk_norm, self.dim,
            dtype=self.dtype, name="attention")(
                attn_in, None, rope_cos, rope_sin, y_n, None)
        ffn_in = modulate(RMSNorm(self.dim, self.norm_eps, dtype=self.dtype,
                                  name="ffn_norm")(h), s_mlp, sc_mlp)
        out = TimeFreqMoE(self.dim, 4 * self.dim, self.num_experts,
                          self.multiple_of, dtype=self.dtype,
                          name="feed_forward")(ffn_in, t)
        return h + g_mlp[:, None, :] * out


class TimeFreqMoeDiT(fnn.Module):
    """``VideoFlagLargeDiT`` equivalent (``flag_large_dit_moe.py:607-734``):
    latent + text context, no acoustic stream. ``(x [B,C,T], t [B],
    context [B,Ty,ctx]) -> (v [B,C,T], 0.0)`` (no load-balance loss — the
    routing is hard)."""

    in_channels: int
    context_dim: int
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    max_len: int = 1000
    num_experts: int = 8
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    norm_eps: float = 1e-5
    qk_norm: bool = False
    rope_scaling_factor: float = 1.0
    ntk_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: Array, t: Array, context: Any,
                 step=0, train: bool = False) -> Tuple[Array, Array]:
        if isinstance(context, dict):
            context = context.get("c_crossattn", context)
        head_dim = self.hidden_size // self.num_heads
        cos, sin = precompute_rope(head_dim, self.max_len,
                                   rope_scaling_factor=self.rope_scaling_factor,
                                   ntk_factor=self.ntk_factor)
        rope_cos, rope_sin = jnp.asarray(cos), jnp.asarray(sin)

        h = fnn.Dense(self.hidden_size, dtype=self.dtype,
                      name="proj_in")(jnp.swapaxes(x, 1, 2))
        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 name="t_embedder")(t)
        c = ConditionEmbedder(self.hidden_size, dtype=self.dtype,
                              name="c_embedder")(context)
        cap_emb = fnn.Dense(self.hidden_size, dtype=self.dtype,
                            kernel_init=xavier, name="cap_embedder")(
            fnn.LayerNorm(dtype=self.dtype, name="cap_embedder_norm")(
                c.mean(axis=1)))
        adaln_input = t_emb + cap_emb

        for i in range(self.depth):
            h = TimeFreqBlock(self.hidden_size, self.num_heads,
                              self.num_experts, self.n_kv_heads,
                              self.multiple_of, self.norm_eps, self.qk_norm,
                              dtype=self.dtype, name=f"blocks_{i}")(
                h, c, rope_cos, rope_sin, adaln_input, t)
        out = FinalLayer(self.hidden_size, self.in_channels, dtype=self.dtype,
                         name="final_layer")(h, adaln_input)
        return jnp.swapaxes(out, 1, 2), jnp.float32(0.0)
