"""Fused alias-free Snake activation (BigVGAN ``Activation1d``) as one Pallas
TPU kernel.

The reference activation (``vocoder/bigvgan/alias_free_torch/act.py``) is
2x kaiser-sinc upsample -> snake -> 2x kaiser-sinc downsample. Run as three
XLA ops it materializes two [B, 2T, C] intermediates and two slow depthwise
convs per call — measured ~1.9 ms per activation at the 20 s stage-4 shape,
~72 activations per BigVGAN forward.

Closed form (r=2, even k): with ``f`` the sum-normalized kaiser-sinc taps,
``g = 2 f``, and ``x`` replicate-extended,

  y_even[m] = sum_a g[k-1-2a] * x[m + a - (k//4 + 0)]        (a = 0..k/2-1)
  y_odd[m]  = sum_a g[k-2-2a] * x[m + a - (k//4 - 1)]
  out[t]    = sum_b f[2b]   * S(y_odd[t + b - k//4])
            + sum_b f[2b+1] * S(y_even[t + b - k//4 + 1])

(S = snake). Everything is static shifted multiply-adds over a [T, C] tile —
one HBM read + one write per activation, all arithmetic fused in VMEM.
Derivation/verification: tests/test_fused_act1d.py checks the kernel against
the unfused UpSample1d -> snake -> DownSample1d module to 1e-5 (fp32).

Interior blocks are exact. The down-stage's replicate padding of the
*upsampled* signal affects only the first/last ``k//4`` output frames; the
wrapper recomputes those few frames exactly in XLA (tiny tensors).

Small-channel stages pack ``p`` consecutive time windows into the lane axis
(``p*C <= 128``) so the VPU runs full width at C=32/64.
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

_LANES = 128


def _snake(y, a, inv_b):
    s = jnp.sin(y * a)
    return y + inv_b * s * s


def _act_kernel(x_ref, al_ref, ib_ref, o_ref, *, taps, Tb: int, halo: int):
    """x_ref: [1, 1, Tb + 2*halo, Cp]; al/ib: [1, Cp]; o: [1, 1, Tb, Cp].

    ``taps``: static tuple of k python floats (kaiser-sinc).
    """
    k = len(taps)
    q = k // 4  # = 3 for k=12
    xb = x_ref[0, 0].astype(jnp.float32)           # [Tb+2h, Cp]
    a = al_ref[0].astype(jnp.float32)              # [Cp]
    inv_b = ib_ref[0].astype(jnp.float32)

    n_half = k // 2
    # y arrays over m' = 0 .. Tb + 2q - 1 (m = t0 + m' - q), offset into xb:
    # x[m + a_i - q] = xb[m' + a_i + (halo - 2q)] for y_even
    # x[m + a_i - q + 1] = xb[m' + a_i + (halo - 2q) + 1] for y_odd
    M = Tb + 2 * q
    base_e = halo - 2 * q
    base_o = base_e + 1
    ye = None
    yo = None
    for ai in range(n_half):
        ge = 2.0 * taps[k - 1 - 2 * ai]
        go = 2.0 * taps[k - 2 - 2 * ai]
        sl_e = xb[base_e + ai: base_e + ai + M, :]
        sl_o = xb[base_o + ai: base_o + ai + M, :]
        ye = sl_e * ge if ye is None else ye + sl_e * ge
        yo = sl_o * go if yo is None else yo + sl_o * go

    se = _snake(ye, a, inv_b)
    so = _snake(yo, a, inv_b)

    out = None
    for b in range(n_half):
        fe = taps[2 * b]
        fo = taps[2 * b + 1]
        t_o = so[b: b + Tb, :]
        t_e = se[b + 1: b + 1 + Tb, :]
        term = t_o * fe + t_e * fo
        out = term if out is None else out + term
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _edge_fix(x: Array, alpha, inv_beta, taps: np.ndarray, out: Array,
              edge: int) -> Array:
    """Recompute the first/last ``edge`` frames exactly (the down stage
    replicate-pads the UPSAMPLED signal; the kernel's x-clamping differs
    there). Pure jnp on tiny slices."""
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

    for t in list(range(edge)) + list(range(T - edge, T)):
        acc = 0.0
        for j in range(k):
            acc = acc + s_cached(2 * t + j - (n_half - 1)) * f[j]
        out = out.at[:, t, :].set(acc.astype(out.dtype))
    return out


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
    halo = 2 * q + 2  # covers both y arrays' reach (max index base_o + a + M)

    if block_t is None:
        for cand in (512, 480, 320, 256, 160, 128, 96, 64, 40, 32, 16, 8):
            if T % cand == 0 and cand >= 2 * halo:
                block_t = cand
                break
        else:
            return None
    if T % block_t or block_t % 8:
        return None
    nb = T // block_t

    # lane packing: put p consecutive windows side by side when C is small
    p = 1
    while (2 * p * C <= _LANES) and (nb % (2 * p) == 0):
        p *= 2

    taps = tuple(float(v) for v in kaiser_sinc_filter1d(0.25, 0.3, k))

    af = alpha.astype(jnp.float32)
    bf = af if beta is None else beta.astype(jnp.float32)
    if logscale:
        af, bf = jnp.exp(af), jnp.exp(bf)
    inv_bf = 1.0 / (bf + 1e-9)

    # windows with halo: xpad[i] = x[clamp(i - halo)]. Built with O(1) graph
    # size (two reshapes + one concat) — a per-window python stack put ~3000
    # slice ops in the graph at the 20 s stage-4 shape (372 s compiles).
    xpad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)), mode="edge")
    h2 = 2 * halo
    core = xpad[:, :nb * block_t].reshape(B, nb, block_t, C)
    tail_src = xpad[:, block_t:]                  # rows (w+1)*Tb + [0, 2h)
    pad_rows = nb * block_t - tail_src.shape[1]
    tail_src = jnp.pad(tail_src, ((0, 0), (0, pad_rows), (0, 0)))
    tail = tail_src.reshape(B, nb, block_t, C)[:, :, :h2]
    xwin = jnp.concatenate([core, tail], axis=2)  # [B, nb, Tb+2h, C]
    if p > 1:
        xwin = xwin.reshape(B, nb // p, p, block_t + 2 * halo, C)
        xwin = jnp.moveaxis(xwin, 2, 3)           # [B, nb/p, Tb+2h, p, C]
        xwin = xwin.reshape(B, nb // p, block_t + 2 * halo, p * C)
    Cp = p * C
    al = jnp.tile(af, (p,))[None, :]              # [1, p*C]
    ib = jnp.tile(inv_bf, (p,))[None, :]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(_act_kernel, taps=taps, Tb=block_t, halo=halo)
    out = pl.pallas_call(
        kern,
        grid=(B, nb // p),
        in_specs=[
            pl.BlockSpec((1, 1, block_t + 2 * halo, Cp),
                         lambda b, w: (b, w, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_t, Cp), lambda b, w: (b, w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb // p, block_t, Cp), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 24 * B * T * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=2 * B * T * C,
        ),
    )(xwin, al, ib)

    if p > 1:
        out = out.reshape(B, nb // p, block_t, p, C)
        out = jnp.moveaxis(out, 3, 2)             # [B, nb/p, p, Tb, C]
    out = out.reshape(B, T, C)
    return _edge_fix(x, af, inv_bf, np.asarray(taps), out, edge=q)
