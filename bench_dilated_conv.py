"""Microbench: PWG's dilated gate conv (k=3, 64->128, T=480k) three ways.

a) lax.conv_general_dilated with rhs_dilation (current WNConv1d path)
b) shifted-slice matmuls: y = sum_tap x[t+(tap-1)d] @ W[tap] (pure MXU)
c) space-to-depth blocked conv (r=2) for comparison

On-device scan harness over distinct inputs (honest protocol).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T = 480000
CIN, COUT = 64, 128
K = 3
DTYPE = jnp.bfloat16
N = 8


def scan_time(fn, stacked, iters=N):
    @jax.jit
    def many(stacked):
        def body(c, x):
            out = fn(x)
            return c + jnp.sum(out[..., :1].astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return c

    @jax.jit
    def floor(stacked):
        def body(c, x):
            return c + x.reshape(-1)[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return c

    float(many(stacked))
    float(floor(stacked))
    t0 = time.perf_counter()
    float(many(stacked))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(floor(stacked))
    t_floor = time.perf_counter() - t0
    return (t_many - t_floor) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (N, 1, T, CIN), DTYPE)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, CIN, COUT), DTYPE)

    for d in (1, 64, 512):
        pad = (K - 1) // 2 * d

        def conv(x, d=d, pad=pad):
            return jax.lax.conv_general_dilated(
                x, w, (1,), [(pad, pad)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32).astype(DTYPE)

        def shifted(x, d=d, pad=pad):
            xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
            acc = jnp.zeros((x.shape[0], T, COUT), jnp.float32)
            for tap in range(K):
                acc = acc + jnp.dot(xp[:, tap * d:tap * d + T],
                                    w[tap], preferred_element_type=jnp.float32)
            return acc.astype(DTYPE)

        ca = scan_time(conv, xs)
        cb = scan_time(shifted, xs)
        print(f"d={d:4d}: conv {ca:7.2f} ms   shifted-matmul {cb:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
