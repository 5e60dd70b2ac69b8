"""Pallas TPU flash attention for the DiT hot path.

The TPU-native replacement for the reference's external ``flash_attn`` CUDA
kernels (``ldm/modules/diffusionmodules/flag_large_dit_moe.py:19-27,353-379``).
Instead of the CUDA varlen/unpadding path, padded fixed-shape buckets with
per-example valid key lengths — the layout XLA and the MXU want.

Design:
  * Blocked online-softmax attention: grid ``(B, H, Tq/block_q)``; the kernel
    streams K/V in ``block_k`` chunks with running (max, denom, acc) carried
    through a ``fori_loop`` — O(T) VMEM rather than O(T^2).
  * Head dim is zero-padded to a lane multiple (128) in the wrapper; zero
    columns contribute nothing to q.k^T and the extra v channels are sliced off.
  * Padding mask via ``kv_len [B]`` scalars (SMEM): key positions >= kv_len get
    -inf logits. This subsumes bucket padding and per-example varlen.
  * Differentiable via ``jax.custom_vjp``: backward recomputes attention with
    the pure-jnp ``sdpa`` formulation and takes its VJP (flash-style recompute —
    no O(T^2) residuals are saved).

Numerics: logits/softmax/accumulation in fp32 regardless of input dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 block_k: int, num_k_blocks: int):
    # q_ref: [1, 1, block_q, D]; k_ref/v_ref: [1, 1, Tk_pad, D]
    # len_ref: [B] in SMEM (full array — Mosaic requires rank-1 SMEM blocks to
    # span the array), indexed by the batch grid coordinate.
    q = q_ref[0, 0].astype(jnp.float32) * scale
    kv_len = len_ref[pl.program_id(0)]
    block_q, D = q.shape

    def body(j, carry):
        m, l, acc = carry
        start = j * block_k
        k_blk = k_ref[0, 0, pl.ds(start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [block_q, block_k]
        col = start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        v_blk = v_ref[0, 0, pl.ds(start, block_k), :].astype(jnp.float32)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)[:, None]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_fwd_impl(q: Array, k: Array, v: Array, kv_len: Array, scale: float,
                    block_q: int, block_k: int, interpret: bool) -> Array:
    """q: [B, Tq, H, D]; k/v: [B, Tk, H, D]; kv_len: [B] int32."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    Dp = _round_up(D, _LANE)
    Tqp = _round_up(Tq, block_q)
    Tkp = _round_up(Tk, block_k)

    # [B, H, T, D] layout, zero-padded to tile boundaries.
    qt = jnp.moveaxis(q, 2, 1)
    kt = jnp.moveaxis(k, 2, 1)
    vt = jnp.moveaxis(v, 2, 1)
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Tqp - Tq), (0, Dp - D)))
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Tkp - Tk), (0, Dp - D)))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Tkp - Tk), (0, Dp - D)))
    kv_len = jnp.minimum(kv_len.astype(jnp.int32), Tk)

    num_k_blocks = Tkp // block_k
    kernel = functools.partial(_attn_kernel, scale=scale, block_k=block_k,
                               num_k_blocks=num_k_blocks)
    out = pl.pallas_call(
        kernel,
        grid=(B, H, Tqp // block_q),
        in_specs=[
            pl.BlockSpec((B,), lambda b, h, i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tkp, Dp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tkp, Dp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tqp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tqp * Tkp * Dp,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * H * Tqp * Tkp,
        ),
    )(kv_len, qt, kt, vt)
    return jnp.moveaxis(out[:, :, :Tq, :D], 1, 2)


def _sdpa_ref(q, k, v, kv_len, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(k.shape[1])[None, :] < kv_len[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, kv_len, scale, block_q, block_k, interpret):
    return _flash_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, kv_len, scale, block_q, block_k, interpret):
    return _flash_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret), \
        (q, k, v, kv_len)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_len = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_ref(q_, k_, v_, kv_len, scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_len: Optional[Array] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """Masked flash attention. ``q``: [B, Tq, H, D]; ``k``/``v``: [B, Tk, H, D].

    ``kv_len``: [B] int32 valid key lengths (default: all Tk valid). Returns
    [B, Tq, H, D] in q's dtype. ``interpret=None`` auto-selects interpreter
    mode off-TPU so the same code path runs in CPU tests.

    ``block_k=None`` picks the measured-fastest v5e plan: one full-width key
    pass (no fori_loop) for Tk <= 1536 — the framework's whole operating range
    (max_len 1500) — falling back to 512-wide streaming blocks beyond that.
    """
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    if kv_len is None:
        kv_len = jnp.full((B,), Tk, jnp.int32)
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_k is None:
        block_k = _round_up(Tk, 8) if Tk <= 1536 else 512
    block_q = min(block_q, _round_up(Tq, 8))
    block_k = min(block_k, _round_up(Tk, 8))
    return _flash(q, k, v, kv_len, float(scale), block_q, block_k, interpret)
