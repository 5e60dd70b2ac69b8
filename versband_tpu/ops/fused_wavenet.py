"""Fused gated-WaveNet residual layer as a Pallas TPU kernel.

One ParallelWaveGAN residual layer (reference
``parallel_wavegan/layers/residual_block.py:39-130``) is, per sample t:

    gate  = W_g0 x[t-d] + W_g1 x[t] + W_g2 x[t+d] + W_c c[t] + b_g   # [2G]
    z     = tanh(gate[:G]) * sigmoid(gate[G:])                        # [G]
    skip' = skip + W_s z + b_s                                        # [S]
    x'    = (W_o z + b_o + x[t]) * sqrt(0.5)                          # [R]

XLA runs the five ops as separate HBM passes (dilated conv lowering plus
unfused gate/1x1s measured ~2.9 ms/layer at T=480k on v5e); this kernel does
them in one pass over T blocks: the dilated taps come from two small halo
side-blocks (D_HALO rows each) instead of re-reading whole neighbor blocks,
the gate/aux matmuls hit the MXU back to back, and the skip accumulator is
read+written once per layer in fp32.

Dilation is STATIC per call: the generator unrolls its layers in Python, so
each distinct dilation (10 of them for the 30-layer config) compiles once.

Layout: x [B, T, R], c [B, T, A], skip [B, T, S] fp32. T must be a multiple
of the block size and at least 2*D_HALO; callers zero-pad T and slice back
(the kernel re-zeroes the tail pad each layer, preserving exact per-layer
SAME zero-pad semantics). block_t=2048 is the largest block whose
double-buffered refs + fp32 gate intermediates fit the 16 MB scoped-VMEM
stack on v5e (4096 exceeds it by ~2 MB at R=S=64, A=80).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

D_HALO = 512  # max supported dilation; halo side-block row count
BLOCK_T = 2048  # default T block: largest fitting v5e scoped VMEM (see above)


def _layer_kernel(prevh_ref, cur_ref, nxth_ref, c_ref, skip_ref,
                  wg_ref, wc_ref, wso_ref, bg_ref, bso_ref,
                  x_out_ref, skip_out_ref, *, d: int, Tb: int, t_real: int,
                  n_skip: int):
    w = pl.program_id(1)
    f32 = jnp.float32

    cur = cur_ref[0]                                   # [Tb, R]
    xm = jnp.concatenate([prevh_ref[0, D_HALO - d:], cur[:Tb - d]], axis=0)
    xp = jnp.concatenate([cur[d:], nxth_ref[0, :d]], axis=0)

    # zero-pad semantics at the sequence edges: row g reads x[g-d] / x[g+d],
    # which must be 0 outside [0, t_real). The tail pad region of x is kept
    # zero by the x' mask below, so only the g-d < 0 edge needs masking here
    # (the clamped halo index map re-reads block 0 garbage there).
    g = w * Tb + jax.lax.broadcasted_iota(jnp.int32, (Tb, 1), 0)
    xm = jnp.where(g >= d, xm, jnp.zeros_like(xm))
    # last block: the clamped next-halo map re-reads in-range rows for
    # g+d >= T_pad; true zero-pad semantics want zeros there
    T_pad = pl.num_programs(1) * Tb
    xp = jnp.where(g < T_pad - d, xp, jnp.zeros_like(xp))

    gate = jnp.dot(xm, wg_ref[0], preferred_element_type=f32)
    gate += jnp.dot(cur, wg_ref[1], preferred_element_type=f32)
    gate += jnp.dot(xp, wg_ref[2], preferred_element_type=f32)
    gate += jnp.dot(c_ref[0], wc_ref[...], preferred_element_type=f32)
    gate += bg_ref[...].astype(f32)

    half = gate.shape[-1] // 2
    z = jnp.tanh(gate[:, :half]) * jax.nn.sigmoid(gate[:, half:])

    so = jnp.dot(z.astype(cur.dtype), wso_ref[...], preferred_element_type=f32)
    so += bso_ref[...].astype(f32)

    skip_out_ref[0] = skip_ref[0] + so[:, :n_skip]
    x_new = (so[:, n_skip:] + cur.astype(f32)) * math.sqrt(0.5)
    # keep the tail pad region exactly zero so the next layer's x[t+d] reads
    # from it are true SAME zero-padding
    x_out_ref[0] = jnp.where(g < t_real, x_new, 0.0).astype(cur.dtype)


def fused_wavenet_layer(
    x: Array, c: Array, skip: Array,
    w_gate: Array, b_gate: Array, w_caux: Array,
    w_skip: Array, b_skip: Array, w_out: Array, b_out: Array,
    dilation: int, t_real: int,
    block_t: int = BLOCK_T, interpret: Optional[bool] = None,
) -> Optional[Tuple[Array, Array]]:
    """One fused residual layer. Returns ``(x', skip')`` or None when the
    shapes don't fit the kernel's constraints (caller falls back).

    x: [B, T, R]; c: [B, T, A]; skip: [B, T, S] fp32 accumulator.
    w_gate: [3, R, 2G] (tap-major folded conv kernel); w_caux: [A, 2G];
    w_skip: [G, S]; w_out: [G, R]; biases fp32 ([2G], [S], [R]).
    T must be a multiple of ``block_t``; ``t_real`` marks where the zero tail
    pad starts.
    """
    B, T, R = x.shape
    k, rin, g2 = w_gate.shape
    G = g2 // 2
    S = w_skip.shape[1]
    if (k != 3 or rin != R or w_out.shape != (G, R) or w_skip.shape[0] != G
            or not 0 < dilation <= D_HALO or T % block_t
            or block_t % D_HALO or c.shape[:2] != (B, T)
            or skip.shape != (B, T, S) or skip.dtype != jnp.float32):
        return None
    nb = T // block_t
    hb = T // D_HALO  # halo side-blocks address x in D_HALO-row units
    hpb = block_t // D_HALO

    # skip|out fused into one full-width matmul
    wso = jnp.concatenate([w_skip, w_out], axis=1)           # [G, S+R]
    bso = jnp.concatenate([b_skip, b_out])[None, :]          # [1, S+R]
    bg = b_gate[None, :]                                     # [1, 2G]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cur = pl.BlockSpec((1, block_t, R), lambda b, w: (b, w, 0),
                       memory_space=pltpu.VMEM)
    prevh = pl.BlockSpec((1, D_HALO, R),
                         lambda b, w: (b, jnp.maximum(w * hpb - 1, 0), 0),
                         memory_space=pltpu.VMEM)
    nxth = pl.BlockSpec((1, D_HALO, R),
                        lambda b, w: (b, jnp.minimum(w * hpb + hpb,
                                                     hb - 1), 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, block_t, c.shape[-1]), lambda b, w: (b, w, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, block_t, S), lambda b, w: (b, w, 0),
                         memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, w: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    kern = functools.partial(_layer_kernel, d=int(dilation), Tb=block_t,
                             t_real=int(t_real), n_skip=S)
    x2, skip2 = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[prevh, cur, nxth, cspec, sspec,
                  full(w_gate), full(w_caux), full(wso), full(bg), full(bso)],
        out_specs=[cur, sspec],
        out_shape=[jax.ShapeDtypeStruct((B, T, R), x.dtype),
                   jax.ShapeDtypeStruct((B, T, S), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (3 * R + c.shape[-1]) * g2
            + 2 * B * T * G * (S + R),
            bytes_accessed=(x.size * x.dtype.itemsize * 2
                            + c.size * c.dtype.itemsize + skip.size * 8),
            transcendentals=2 * B * T * G,
        ),
    )(x, x, x, c, skip, w_gate, w_caux, wso, bg, bso)
    return x2, skip2
