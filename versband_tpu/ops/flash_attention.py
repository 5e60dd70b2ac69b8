"""Pallas TPU flash attention for the DiT hot path.

The TPU-native replacement for the reference's external ``flash_attn`` CUDA
kernels (``ldm/modules/diffusionmodules/flag_large_dit_moe.py:19-27,353-379``).
Instead of the CUDA varlen/unpadding path, padded fixed-shape buckets with
per-example valid key lengths — the layout XLA and the MXU want.

Design:
  * Forward: blocked online-softmax attention, grid ``(B, H, Tq/block_q)``;
    the kernel streams K/V in ``block_k`` chunks with running (max, denom,
    acc) carried through a ``fori_loop`` — O(T) VMEM rather than O(T^2).
    Also emits the per-row log-sum-exp ``lse [B, H, Tq]`` as the only
    softmax residual.
  * Backward: two blocked Pallas kernels that *recompute* attention
    probabilities from (q, k, lse) — flash-style, no O(T^2) residuals saved
    and no O(T^2) HBM traffic in the backward either:
      - ``dq`` kernel, grid ``(B, H, Tq/block_q)``, streams K/V;
      - ``dk/dv`` kernel, grid ``(B, H, Tk/block_k)``, streams Q/dO.
    The softmax-Jacobian row term ``delta = rowsum(dO * O)`` is a cheap
    elementwise reduce done in XLA outside the kernels.
  * Head dim is zero-padded to a lane multiple (128) in the wrapper; zero
    columns contribute nothing to q.k^T and the extra v channels are sliced
    off.
  * Padding mask via ``kv_len [B]`` scalars (SMEM): key positions >= kv_len
    get -inf logits (forward) / zero probabilities (backward). This subsumes
    bucket padding and per-example varlen. Rows with ``kv_len == 0`` return
    zeros (and zero gradients), not a mean of V.

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
# Row statistics (lse, delta) ride a [T, 8] layout: 8 is the fp32 sublane
# tile, and the stat is replicated across this stub trailing dim so the
# block's last two dims stay Mosaic-tileable.
_STAT_LANES = 8
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
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
    # log-sum-exp of the *scaled* logits; clamped finite even for fully-masked
    # rows so the backward's exp(s - lse) never sees an inf. Stored as a
    # [block_q, 8] tile (row stat replicated over a stub lane dim) because
    # Mosaic block shapes need the trailing dims tileable.
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0, 0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[2:])


def _pad_bhtd(x: Array, Tp: int, Dp: int) -> Array:
    """[B, T, H, D] -> [B, H, Tp, Dp] zero-padded."""
    x = jnp.moveaxis(x, 2, 1)
    B, H, T, D = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D)))


def _flash_fwd_impl(q: Array, k: Array, v: Array, kv_len: Array, scale: float,
                    block_q: int, block_k: int, interpret: bool):
    """q: [B, Tq, H, D]; k/v: [B, Tk, H, D]; kv_len: [B] int32.

    Returns (out [B, Tq, H, D], lse [B, H, Tq_pad] fp32).
    """
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    Dp = _round_up(D, _LANE)
    Tqp = _round_up(Tq, block_q)
    Tkp = _round_up(Tk, block_k)

    qt = _pad_bhtd(q, Tqp, Dp)
    kt = _pad_bhtd(k, Tkp, Dp)
    vt = _pad_bhtd(v, Tkp, Dp)
    kv_len = jnp.minimum(kv_len.astype(jnp.int32), Tk)

    num_k_blocks = Tkp // block_k
    kernel = functools.partial(_attn_kernel, scale=scale, block_k=block_k,
                               num_k_blocks=num_k_blocks)
    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, _STAT_LANES),
                         lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tqp, Dp), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tqp, _STAT_LANES), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tqp * Tkp * Dp,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * H * Tqp * Tkp,
        ),
    )(kv_len, qt, kt, vt)
    out = jnp.moveaxis(out[:, :, :Tq, :D], 1, 2)
    # Fully-masked rows (kv_len == 0) have no valid keys: define attn(x) = 0.
    out = jnp.where((kv_len > 0)[:, None, None, None], out, 0)
    return out, lse


def _dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, scale: float, block_k: int, num_k_blocks: int):
    # Per (b, h, q-block): dq_i = scale * sum_j P_ij (dP_ij - delta_i) k_j
    # with P recomputed from lse. Streams K/V in block_k chunks.
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, :, 0:1]      # [block_q, 1] fp32
    delta = delta_ref[0, 0, :, 0:1]  # [block_q, 1] fp32
    kv_len = len_ref[pl.program_id(0)]
    block_q, D = q.shape

    def body(j, acc):
        start = j * block_k
        k_blk = k_ref[0, 0, pl.ds(start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        p = jnp.exp(s - lse)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        p = jnp.where(col < kv_len, p, 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bk]
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    acc = jax.lax.fori_loop(0, num_k_blocks, body, acc0)
    dq_ref[0, 0] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale: float, block_q: int,
                num_q_blocks: int, block_k: int):
    # Per (b, h, k-block): dv_j = sum_i P_ij dO_i ; dk_j = scale * sum_i
    # P_ij (dP_ij - delta_i) q_i. Streams Q/dO in block_q chunks. Padded
    # query rows carry dO = 0 and delta = 0, so they contribute nothing.
    k = k_ref[0, 0].astype(jnp.float32)   # [block_k, D]
    v = v_ref[0, 0].astype(jnp.float32)
    kv_len = len_ref[pl.program_id(0)]
    D = k.shape[1]
    col0 = pl.program_id(2) * block_k

    def body(i, carry):
        dk_acc, dv_acc = carry
        start = i * block_q
        q_blk = q_ref[0, 0, pl.ds(start, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, 0, pl.ds(start, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(start, block_q), 0:1]      # [bq, 1]
        delta_blk = delta_ref[0, 0, pl.ds(start, block_q), 0:1]  # [bq, 1]
        s = jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        p = jnp.exp(s - lse_blk)
        col = col0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        p = jnp.where(col < kv_len, p, 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bk, D]
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bk]
        ds = p * (dp - delta_blk)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bk, D]
        return dk_acc, dv_acc

    z = jnp.zeros((block_k, D), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q_blocks, body, (z, z))
    dk_ref[0, 0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, kv_len, out, lse, g, scale, block_q, block_k,
                    interpret):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    Dp = _round_up(D, _LANE)
    Tqp = _round_up(Tq, block_q)
    Tkp = _round_up(Tk, block_k)

    qt = _pad_bhtd(q, Tqp, Dp)
    kt = _pad_bhtd(k, Tkp, Dp)
    vt = _pad_bhtd(v, Tkp, Dp)
    gt = _pad_bhtd(g, Tqp, Dp)
    kv_len = jnp.minimum(kv_len.astype(jnp.int32), Tk)

    # delta_i = rowsum(dO_i * O_i): a cheap elementwise reduce — leave to XLA.
    delta = jnp.einsum("bqhd,bqhd->bhq", g.astype(jnp.float32),
                       out.astype(jnp.float32))
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Tqp - Tq)))
    delta = jnp.broadcast_to(delta[..., None], (B, H, Tqp, _STAT_LANES))

    len_spec = pl.BlockSpec((B,), lambda b, h, i: (0,), memory_space=pltpu.SMEM)

    def qspec(bq):
        return pl.BlockSpec((1, 1, bq, Dp), lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)

    def full(T):
        return pl.BlockSpec((1, 1, T, Dp), lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    def row_blk(bq):
        return pl.BlockSpec((1, 1, bq, _STAT_LANES),
                            lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)

    def row_full():
        return pl.BlockSpec((1, 1, Tqp, _STAT_LANES),
                            lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k,
                          num_k_blocks=Tkp // block_k),
        grid=(B, H, Tqp // block_q),
        in_specs=[len_spec, qspec(block_q), full(Tkp), full(Tkp),
                  qspec(block_q), row_blk(block_q), row_blk(block_q)],
        out_specs=qspec(block_q),
        out_shape=jax.ShapeDtypeStruct((B, H, Tqp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Tqp * Tkp * Dp,
            bytes_accessed=(qt.size + kt.size + vt.size + gt.size)
            * qt.dtype.itemsize,
            transcendentals=B * H * Tqp * Tkp,
        ),
    )(kv_len, qt, kt, vt, gt, lse, delta)

    kspec = pl.BlockSpec((1, 1, block_k, Dp), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q,
                          num_q_blocks=Tqp // block_q, block_k=block_k),
        grid=(B, H, Tkp // block_k),
        in_specs=[len_spec, full(Tqp), kspec, kspec, full(Tqp),
                  row_full(), row_full()],
        out_specs=(kspec, kspec),
        out_shape=(jax.ShapeDtypeStruct((B, H, Tkp, Dp), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Tkp, Dp), v.dtype)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * Tqp * Tkp * Dp,
            bytes_accessed=(qt.size + kt.size + vt.size + gt.size)
            * qt.dtype.itemsize,
            transcendentals=B * H * Tqp * Tkp,
        ),
    )(kv_len, qt, kt, vt, gt, lse, delta)

    dq = jnp.moveaxis(dq[:, :, :Tq, :D], 1, 2)
    dk = jnp.moveaxis(dk[:, :, :Tk, :D], 1, 2)
    dv = jnp.moveaxis(dv[:, :, :Tk, :D], 1, 2)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, kv_len, scale, block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(q, k, v, kv_len, scale, block_q, block_k,
                             interpret)
    return out


def _flash_fwd(q, k, v, kv_len, scale, block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, kv_len, scale, block_q, block_k,
                               interpret)
    return out, (q, k, v, kv_len, out, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_len, out, lse = res
    # The forward may have run with a full-width single-pass key plan; the
    # backward always streams in bounded blocks so VMEM stays O(block^2).
    bq = min(block_q, 256)
    bk = min(block_k, 256)
    # lse was produced at the forward's block_q granularity (padded to
    # block_q); re-pad if the backward uses a different q padding. Padded
    # rows carry dO = 0 and delta = 0 so any lse value there is inert.
    Tq = q.shape[1]
    Tqp_fwd = lse.shape[2]
    Tqp_bwd = _round_up(Tq, bq)
    if Tqp_bwd > Tqp_fwd:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Tqp_bwd - Tqp_fwd), (0, 0)))
    elif Tqp_bwd < Tqp_fwd:
        lse = lse[:, :, :Tqp_bwd]
    dq, dk, dv = _flash_bwd_impl(q, k, v, kv_len, out, lse, g, scale, bq, bk,
                                 interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _sdpa_ref(q, k, v, kv_len, scale):
    """Dense jnp reference (tests / numerics oracle only)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(k.shape[1])[None, :] < kv_len[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


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
    (max_len 1500) — and 512-wide compute blocks beyond that. NOTE the kernel
    keeps the full K/V for one (b, h) resident in VMEM (the fori_loop streams
    COMPUTE, not memory); past the VMEM budget (~Tk 12k fp32 / 24k bf16 at
    D=128) the wrapper falls back to masked SDPA rather than fail Mosaic
    allocation — a k-grid streaming kernel is the long-context upgrade path.

    Differentiable end-to-end in Pallas: the backward recomputes attention
    probabilities blockwise from the saved log-sum-exp (dq kernel over query
    blocks, dk/dv kernel over key blocks) — O(block^2) VMEM and O(T) HBM
    residuals, matching the forward's flash guarantees.
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
    # VMEM-resident bound: the kernel (and both backward kernels) hold one
    # (b, h)'s full K/V (resp. Q/dO) in VMEM; past ~12 MB Mosaic cannot
    # allocate. Degrade to masked SDPA instead of failing at compile.
    resident = 2 * _round_up(max(Tq, Tk), block_k) * _round_up(D, _LANE) \
        * k.dtype.itemsize
    if resident > 12 * 2 ** 20:
        return _sdpa_masked(q, k, v, kv_len, float(scale))
    return _flash(q, k, v, kv_len, float(scale), block_q, block_k, interpret)


def _sdpa_masked(q: Array, k: Array, v: Array, kv_len: Array,
                 scale: float) -> Array:
    """Masked SDPA with flash_attention's exact semantics (key positions >=
    kv_len ignored; kv_len == 0 rows return 0). O(Tq*Tk) memory — only used
    past the Pallas kernel's VMEM-resident bound."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    valid = (jnp.arange(k.shape[1])[None, :]
             < kv_len.astype(jnp.int32)[:, None])          # [B, Tk]
    logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    out = jnp.where((kv_len > 0)[:, None, None, None], out, 0.0)
    return out.astype(q.dtype)


def flash_attention_sharded(
    q: Array,
    k: Array,
    v: Array,
    kv_len: Optional[Array] = None,
    mesh=None,
    **kw,
) -> Array:
    """``flash_attention`` under a ``(data, model)`` mesh via ``shard_map``.

    Attention is independent per (batch, head), so sharding B over ``data``
    and H over ``model`` makes the Pallas kernel embarrassingly parallel:
    each device runs it on its local [B/d, T, H/m, D] shard with zero
    collectives. This is the multi-device entry XLA cannot derive on its own
    — a pallas_call inside plain pjit is an opaque custom call, which the
    partitioner would replicate (all-gather + full compute per device)
    instead of slicing. Replaces the reference's per-GPU varlen flash path
    (``flag_large_dit_moe.py:353-379``).

    Axes that don't divide the mesh (H % model != 0, B % data != 0) fall
    back to the unsharded kernel rather than fail.
    """
    if mesh is None:
        return flash_attention(q, k, v, kv_len=kv_len, **kw)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from versband_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    B, _, H, _ = q.shape
    n_data = mesh.shape.get(DATA_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if B % n_data or H % n_model:
        return flash_attention(q, k, v, kv_len=kv_len, **kw)
    if kv_len is None:
        kv_len = jnp.full((B,), k.shape[1], jnp.int32)
    qkv_spec = P(DATA_AXIS, None, MODEL_AXIS, None)
    fn = shard_map(
        lambda q, k, v, n: flash_attention(q, k, v, kv_len=n, **kw),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(DATA_AXIS)),
        out_specs=qkv_spec,
        # the pallas_call's out ShapeDtypeStruct carries no vma annotation,
        # which trips shard_map's varying-axis checker; the kernel is
        # per-(batch, head) independent so there is nothing to check
        check_vma=False,
    )
    return fn(q, k, v, kv_len)
