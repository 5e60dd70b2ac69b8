"""SpatialTransformer — 2-D token transformer for the legacy 2-D UNet path.

Re-design of ``ldm/modules/attention.py`` (SpatialTransformer + its
BasicTransformerBlock: self-attn, cross-attn to context, GEGLU FFN) used by
the 2-D LDM family. Images are [B, C, H, W] at the boundary; internally
tokens are [B, H*W, C]. Gradient checkpointing (the torch ``checkpoint``
helper, ``diffusionmodules/util.py:102-148``) maps to ``jax.checkpoint`` via
the ``remat`` flag.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as fnn

from versband_tpu.models.concat_dit import CrossAttention

Array = jax.Array


class GEGLU(fnn.Module):
    dim_out: int

    @fnn.compact
    def __call__(self, x: Array) -> Array:
        h = fnn.Dense(self.dim_out * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * fnn.gelu(gate, approximate=False)


class BasicTransformerBlock(fnn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None

    @fnn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        x = x + CrossAttention(self.dim, None, self.n_heads, self.d_head,
                               name="attn1")(fnn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.dim, self.context_dim, self.n_heads,
                               self.d_head, name="attn2")(
            fnn.LayerNorm(name="norm2")(x), context)
        h = GEGLU(self.dim * 4, name="ff_in")(fnn.LayerNorm(name="norm3")(x))
        return x + fnn.Dense(self.dim, name="ff_out")(h)


class SpatialTransformer(fnn.Module):
    """[B, C, H, W] + context [B, Ty, ctx] -> [B, C, H, W] with a zero-init
    output projection (residual-safe)."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    remat: bool = False

    @fnn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        B, C, H, W = x.shape
        inner = self.n_heads * self.d_head
        h = fnn.GroupNorm(num_groups=min(32, C), epsilon=1e-6,
                          name="norm")(x.transpose(0, 2, 3, 1))
        h = fnn.Conv(inner, (1, 1), name="proj_in")(h)
        h = h.reshape(B, H * W, inner)
        block_cls = BasicTransformerBlock
        if self.remat:
            block_cls = fnn.remat(BasicTransformerBlock,
                                  static_argnums=())
        for i in range(self.depth):
            h = block_cls(inner, self.n_heads, self.d_head, self.context_dim,
                          name=f"blocks_{i}")(h, context)
        h = h.reshape(B, H, W, inner)
        h = fnn.Conv(C, (1, 1), kernel_init=fnn.initializers.zeros,
                     name="proj_out")(h)
        return x + h.transpose(0, 3, 1, 2)
