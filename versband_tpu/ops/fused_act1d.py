"""Fused alias-free Snake activation (BigVGAN ``Activation1d``) as one Pallas
TPU kernel.

The reference activation (``vocoder/bigvgan/alias_free_torch/act.py``) is
2x kaiser-sinc upsample -> snake -> 2x kaiser-sinc downsample. Run as three
XLA ops it materializes two [B, 2T, C] intermediates and two slow depthwise
convs per call; run as dense diag-expanded matmul-convs it burns ~85x the
real FLOPs (a depthwise FIR densified over C multiplies work by C).

Closed form (r=2 resample ratio, even k): with ``f`` the sum-normalized
kaiser-sinc taps and ``g = 2 f``,

  ye[m] = sum_a g[k-1-2a] * x[m + a - q]          (a = 0..k/2-1, q = k//4)
  yo[m] = sum_a g[k-2-2a] * x[m + a - q + 1]
  out[t] = sum_b f[2b] * S(yo)[t + b - q] + f[2b+1] * S(ye)[t + b - q + 1]

(S = snake) — 24 static shifted multiply-adds per sample, pure VPU work.

Packed-lane layout (v3): small-channel vocoder tails (C=32/64) waste 3/4 of
every (8,128) vector register and pad conv operands to 128 lanes. The kernel
therefore consumes x reshaped ``[T, C] -> [T/r, r*C]`` with ``r*C = 128`` — a
FREE row-major reshape — and implements a shift by ``d`` samples as a
lane-group rotation by ``d mod r`` plus a one-row-masked row shift, keeping
every vector op at full 128-lane width. Per-call overheads that dominated
earlier designs (measured at T=481k, C=32: 6.3 ms/act for halo-window
materialization in XLA, ~8 us/grid-step at 512-row blocks) are gone: halos
ride in from NEIGHBOR blocks (three in_specs over the same array with
w-1/w/w+1 clamped index maps) and blocks are sized to ~512 KB.

Edge handling is EXACT in-kernel: the first/last blocks replicate-clamp
their halo reads to reproduce the reference's replicate padding of both the
input and the upsampled signal (no XLA fix-up pass; ``_edge_fix`` survives
only for the polyphase fallback in ``vocoder/bigvgan.py``).

Verification: tests/test_fused_act1d.py checks the kernel against the
unfused UpSample1d -> snake -> DownSample1d module to 1e-5 (fp32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _snake(y, a, inv_b):
    s = jnp.sin(y * a)
    return y + inv_b * s * s


def _shift_terms(rots, d: int, r: int, C: int, lo: int, n: int, group_ids):
    """Rows ``lo .. lo+n`` of the packed array shifted by ``d`` SAMPLES.

    ``rots[dm]``: the source array lane-rotated by ``dm`` groups
    (``rot[row, g*C+c] = src[row, ((g+dm)%r)*C+c]``). A sample shift d
    decomposes as ``g + d = r*(u0 + carry(g)) + ((g + d) mod r)`` with
    ``u0 = floor(d/r)``; lane groups ``g >= r - (d mod r)`` carry into the
    next row."""
    dm = d % r
    u0 = (d - dm) // r
    R = rots[dm]
    lo_rows = R[lo + u0: lo + u0 + n, :]
    if dm == 0:
        return lo_rows
    hi_rows = R[lo + u0 + 1: lo + u0 + 1 + n, :]
    return jnp.where(group_ids >= (r - dm) * C, hi_rows, lo_rows)


def _lane_rots(X, r: int, C: int, dms):
    """Lane-group rotations of X for each needed residue (0 = identity)."""
    rots = {0: X}
    for dm in dms:
        if dm not in rots:
            rots[dm] = jnp.concatenate([X[:, dm * C:], X[:, :dm * C]], axis=1)
    return rots


def _bcast_sample(rowvec, g: int, r: int, C: int):
    """[1, L] -> [1, L] with lane group ``g``'s C channels tiled to every
    group: the packed-layout form of replicating one SAMPLE."""
    if r == 1:
        return rowvec
    piece = rowvec[:, g * C:(g + 1) * C]
    return jnp.concatenate([piece] * r, axis=1)


def _act_kernel(prev_ref, cur_ref, nxt_ref, al_ref, ib_ref, o_ref, *,
                taps, Tb: int, nb: int, r: int, C: int, m: int):
    """prev/cur/nxt: [1, Tb, L] packed blocks (w-1 / w / w+1, index-clamped);
    al/ib: [1, L] (channel params tiled over lane groups); o: [1, Tb, L].

    Edge handling is EXACT in-kernel (no XLA fix-up pass): the first/last
    windows replicate-pad x per SAMPLE (matching ``UpSample1d``'s input
    padding) and clamp the snaked upsampled signal's out-of-range samples to
    its boundary values (matching ``DownSample1d``'s replicate padding of
    the 2T signal)."""
    k = len(taps)
    q = k // 4
    n_half = k // 2
    hr = 2 * m                         # halo rows per side
    L = r * C
    w = pl.program_id(1)
    cur = cur_ref[0].astype(jnp.float32)               # [Tb, L]
    left = jnp.where(w == 0,
                     jnp.broadcast_to(
                         _bcast_sample(cur[0:1, :], 0, r, C), (hr, L)),
                     prev_ref[0, Tb - hr:Tb, :].astype(jnp.float32))
    right = jnp.where(w == nb - 1,
                      jnp.broadcast_to(
                          _bcast_sample(cur[Tb - 1:Tb, :], r - 1, r, C),
                          (hr, L)),
                      nxt_ref[0, :hr, :].astype(jnp.float32))
    X = jnp.concatenate([left, cur, right], axis=0)    # [Tb + 4m, L]
    a = al_ref[0].astype(jnp.float32)
    inv_b = ib_ref[0].astype(jnp.float32)

    group_ids = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    # up-FIR sample shifts: ye at d = a - q, yo at d = a - q + 1
    d_up = [ai - q for ai in range(n_half)] + \
           [ai - q + 1 for ai in range(n_half)]
    rots = _lane_rots(X, r, C, {d % r for d in d_up})
    Ey = Tb + 2 * m                    # y rows: ext rows m .. Tb + 3m
    ye = yo = None
    for ai in range(n_half):
        ge = 2.0 * taps[k - 1 - 2 * ai]
        go = 2.0 * taps[k - 2 - 2 * ai]
        te = _shift_terms(rots, ai - q, r, C, m, Ey, group_ids)
        to = _shift_terms(rots, ai - q + 1, r, C, m, Ey, group_ids)
        ye = te * ge if ye is None else ye + te * ge
        yo = to * go if yo is None else yo + to * go

    se = _snake(ye, a, inv_b)
    so = _snake(yo, a, inv_b)

    # DownSample1d replicate-pads the snaked 2T signal: S[<0] := S[0]
    # (= se sample 0) and S[>=2T] := S[2T-1] (= so sample T-1). In packed
    # rows: se/so rows < m hold samples < 0; rows >= m + Tb hold samples
    # >= the block end (only the LAST block's tail is a true signal end).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Tb + 2 * m, 1), 0)
    s0 = _bcast_sample(se[m:m + 1, :], 0, r, C)        # S[0]
    sl = _bcast_sample(so[m + Tb - 1:m + Tb, :], r - 1, r, C)  # S[2T-1]
    lo_pad = jnp.logical_and(w == 0, row_ids < m)
    hi_pad = jnp.logical_and(w == nb - 1, row_ids >= m + Tb)
    se = jnp.where(lo_pad, s0, jnp.where(hi_pad, sl, se))
    so = jnp.where(lo_pad, s0, jnp.where(hi_pad, sl, so))

    # down-FIR: out[t] = sum_b f[2b]*so[t+b-q] + f[2b+1]*se[t+b-q+1],
    # consumed at Y-index t + m (+ row-decomposed sample shift)
    d_dn = [bi - q for bi in range(n_half)] + \
           [bi - q + 1 for bi in range(n_half)]
    rot_so = _lane_rots(so, r, C, {d % r for d in d_dn})
    rot_se = _lane_rots(se, r, C, {d % r for d in d_dn})
    out = None
    for bi in range(n_half):
        t_o = _shift_terms(rot_so, bi - q, r, C, m, Tb, group_ids)
        t_e = _shift_terms(rot_se, bi - q + 1, r, C, m, Tb, group_ids)
        term = t_o * taps[2 * bi] + t_e * taps[2 * bi + 1]
        out = term if out is None else out + term
    o_ref[0] = out.astype(o_ref.dtype)


def _edge_fix(x: Array, alpha, inv_beta, taps: np.ndarray, out: Array,
              edge: int) -> Array:
    """Recompute the first/last ``edge`` frames exactly (replicate-pad
    semantics of both resample stages). Pure jnp on tiny slices."""
    B, T, C = x.shape
    k = len(taps)
    q = k // 4
    n_half = k // 2
    f = [float(v) for v in taps]

    def s_at(n):  # upsampled-then-snaked sample n (clamped to [0, 2T-1])
        n = min(max(n, 0), 2 * T - 1)
        m, parity = divmod(n, 2)
        acc = 0.0
        for ai in range(n_half):
            if parity == 0:
                gi = 2.0 * f[k - 1 - 2 * ai]
                xi = m + ai - q
            else:
                gi = 2.0 * f[k - 2 - 2 * ai]
                xi = m + ai - q + 1
            xi = min(max(xi, 0), T - 1)
            acc = acc + x[:, xi, :].astype(jnp.float32) * gi
        s = jnp.sin(acc * alpha)
        return acc + inv_beta * s * s

    cache = {}

    def s_cached(n):
        n = min(max(n, 0), 2 * T - 1)
        if n not in cache:
            cache[n] = s_at(n)
        return cache[n]

    fixes = []
    rows = list(range(edge)) + list(range(T - edge, T))
    for t in rows:
        acc = 0.0
        for j in range(k):
            acc = acc + s_cached(2 * t + j - (n_half - 1)) * f[j]
        fixes.append(acc.astype(out.dtype))
    head = jnp.stack(fixes[:edge], axis=1)              # [B, edge, C]
    tail = jnp.stack(fixes[edge:], axis=1)
    # two in-place dynamic-update-slices; a concat of
    # [head, out[:, edge:-edge], tail] forces a sublane-misaligned copy of
    # the WHOLE array per activation (measured +1.3 ms/act in the composed
    # generator)
    return out.at[:, :edge, :].set(head).at[:, T - edge:, :].set(tail)


def fused_alias_free_snake(
    x: Array,
    alpha: Array,
    beta: Optional[Array] = None,
    logscale: bool = True,
    kernel_size: int = 12,
    block_t: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Optional[Array]:
    """Fused 2x-up -> snake -> 2x-down over ``[B, T, C]``.

    Returns None when the shape doesn't fit the kernel's constraints (caller
    falls back to the unfused modules). ``alpha``/``beta``: [C] params
    (pre-``exp`` when ``logscale``).
    """
    from versband_tpu.vocoder.bigvgan import kaiser_sinc_filter1d

    B, T, C = x.shape
    k = kernel_size
    if k % 4 != 0:
        return None
    q = k // 4
    n_half = k // 2
    max_shift = max(q, n_half - q)

    # lane packing: r*C = 128 when possible (free row-major reshape);
    # keep at least 8 packed rows (sublane tile) for the block search
    r = 1
    while 2 * r * C <= 128 and T % (2 * r) == 0 and T // (2 * r) >= 8:
        r *= 2
    rows = T // r
    L = r * C
    m = -(-max_shift // r)             # per-FIR-stage reach in packed rows

    if block_t is None:
        # largest divisor of `rows` under ~512 KB blocks: grid-step overhead
        # (~5-8 us each) dominated small blocks, scoped VMEM (16 MB, with
        # lane padding to 128 for narrow L) rules out huge ones
        # 512 KB blocks: measured best (1 MB OOMs scoped VMEM inside the
        # composed generator and regresses pipelining at L=128); 16-row
        # bf16 alignment was tried and measured no better
        max_rows = min(rows, max(4 * m, (512 << 10) // (max(L, 128) * 4)))
        for cand in range(max_rows - max_rows % 8, 0, -8):
            if rows % cand == 0 and cand >= 4 * m:
                block_t = cand
                break
        else:
            # no multiple-of-8 divisor; any divisor works (Mosaic pads the
            # sublane tile), prefer the largest
            for cand in range(max_rows, 4 * m - 1, -1):
                if rows % cand == 0:
                    block_t = cand
                    break
            else:
                return None
    if rows % block_t or block_t < 4 * m:
        return None
    nb = rows // block_t

    taps = tuple(float(v) for v in kaiser_sinc_filter1d(0.25, 0.3, k))

    af = alpha.astype(jnp.float32)
    bf = af if beta is None else beta.astype(jnp.float32)
    if logscale:
        af, bf = jnp.exp(af), jnp.exp(bf)
    inv_bf = 1.0 / (bf + 1e-9)
    al = jnp.tile(af, (r,))[None, :]               # [1, L]
    ib = jnp.tile(inv_bf, (r,))[None, :]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    P = x.reshape(B, rows, L)                      # free, row-major
    xblock = pl.BlockSpec((1, block_t, L), lambda b, w: (b, w, 0),
                          memory_space=pltpu.VMEM)
    xprev = pl.BlockSpec((1, block_t, L),
                         lambda b, w: (b, jnp.maximum(w - 1, 0), 0),
                         memory_space=pltpu.VMEM)
    xnext = pl.BlockSpec((1, block_t, L),
                         lambda b, w: (b, jnp.minimum(w + 1, nb - 1), 0),
                         memory_space=pltpu.VMEM)

    kern = functools.partial(_act_kernel, taps=taps, Tb=block_t, nb=nb,
                             r=r, C=C, m=m)
    out = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            xprev, xblock, xnext,
            pl.BlockSpec((1, L), lambda b, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, L), lambda b, w: (b, w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, L), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 24 * B * T * C,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=2 * B * T * C,
        ),
    )(P, P, P, al, ib)

    return out.reshape(B, T, C)  # edges are exact in-kernel
