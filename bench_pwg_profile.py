"""Per-component profile of the ParallelWaveGAN vocode path on TPU.

PWG is the slowest vocoder tail (4.8 songs/s ~= 96x RT vs 326x HiFi-GAN).
This times its pieces separately at the serving shape (20 s song, bf16) to
locate the bottleneck: the ConvInUpsampleNetwork (1-channel 2-D smoothing
convs), the 30-layer gated WaveNet (dilated k=3 convs + 1x1 stacks), and a
single residual layer. On-device lax.scan harness (the honest protocol
through the axon tunnel, docs/BENCH_NOTES.md): the scan runs over N stacked
DISTINCT inputs so XLA cannot hoist the body out of the loop.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

HOP = 320
T_MEL = 1504
DTYPE = jnp.bfloat16


def scan_time(fn, params, stacked, fixed=(), iters=4):
    """ms/call for fn(params, x_i, *fixed) over the stacked leading axis."""

    @jax.jit
    def many(params, stacked, fixed):
        def body(c, x):
            out = fn(params, x, *fixed)
            s = jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l[..., :1].astype(jnp.float32)),
                out, jnp.float32(0.0))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return c

    @jax.jit
    def floor(stacked):
        def body(c, x):
            return c + x.reshape(-1)[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return c

    float(many(params, stacked, fixed))
    float(floor(stacked))
    t0 = time.perf_counter()
    float(many(params, stacked, fixed))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(floor(stacked))
    t_floor = time.perf_counter() - t0
    return (t_many - t_floor) / iters * 1e3


def parity_check():
    """Fused-vs-dense parity ON DEVICE (not interpret mode): validates the
    kernel's actual Mosaic lowering before any timing is trusted.

    Two passes: HIGHEST matmul precision (both paths do exact fp32 multiplies
    -> any mismatch is a lowering bug; asserted < 5e-5) and DEFAULT precision
    (both paths use MXU bf16-pass multiplies but group ops differently, so
    layer deltas ~1e-4 are pure rounding; reported, asserted only loosely)."""
    from versband_tpu.vocoder.pwg import (ParallelWaveGANGenerator,
                                          ResidualBlock)

    backend = jax.default_backend()
    rng = jax.random

    def layer_rel(dil):
        key = rng.PRNGKey(dil)
        x = rng.normal(rng.fold_in(key, 0), (1, 8192, 64), jnp.float32)
        c = rng.normal(rng.fold_in(key, 1), (1, 8192, 80), jnp.float32)
        s0 = rng.normal(rng.fold_in(key, 2), (1, 8192, 64), jnp.float32)
        blk = ResidualBlock(dilation=dil)
        p = jax.jit(blk.init)(rng.PRNGKey(9), x, c)
        out_d, s_d = jax.jit(blk.apply)(p, x, c)
        out_f, s_f = jax.jit(
            lambda p, x, c, s0: blk.apply(p, x, c, skip=s0))(p, x, c, s0)
        scale = float(jnp.max(jnp.abs(out_d))) + 1e-6
        return max(float(jnp.max(jnp.abs(out_f - out_d))) / scale,
                   float(jnp.max(jnp.abs(s_f - (s0 + s_d))))
                   / (float(jnp.max(jnp.abs(s0 + s_d))) + 1e-6))

    def gen_rel():
        mel = rng.normal(rng.PRNGKey(3), (1, 80, 32), jnp.float32)
        noise = rng.normal(rng.PRNGKey(4), (1, 1, 28 * HOP), jnp.float32)
        dense = ParallelWaveGANGenerator()
        fusedg = ParallelWaveGANGenerator(fused_inference=True)
        p = jax.jit(dense.init)(rng.PRNGKey(5), noise, mel)
        wav_d = jax.jit(dense.apply)(p, noise, mel)
        wav_f = jax.jit(fusedg.apply)(p, noise, mel)
        return float(jnp.max(jnp.abs(wav_f - wav_d))) \
            / (float(jnp.max(jnp.abs(wav_d))) + 1e-6)

    with jax.default_matmul_precision("highest"):
        worst = max(max(layer_rel(d) for d in (1, 64, 512)), gen_rel())
    print(f"parity HIGHEST [{backend}]: worst rel_err={worst:.2e}", flush=True)
    assert worst < 5e-5, \
        f"fused-vs-dense ON-DEVICE lowering parity FAILED: {worst}"
    for dil in (1, 64, 512):
        print(f"parity DEFAULT d={dil:4d}: rel_err={layer_rel(dil):.2e} "
              f"(MXU rounding, informational)", flush=True)
    g = gen_rel()
    print(f"parity DEFAULT generator: rel_err={g:.2e}", flush=True)
    assert g < 0.05, f"default-precision generator delta implausibly big: {g}"
    print(f"on-device parity OK (lowering exact at {worst:.2e})", flush=True)


def main():
    from versband_tpu.vocoder.pwg import (ConvInUpsampleNetwork,
                                          ParallelWaveGANGenerator,
                                          ResidualBlock)

    parity_check()

    key = jax.random.PRNGKey(0)
    N = 4
    mel = jax.random.normal(key, (1, 80, T_MEL), DTYPE)
    mels = jax.random.normal(key, (N, 1, 80, T_MEL), DTYPE)
    T = (T_MEL - 4) * HOP
    noise = jax.random.normal(key, (1, 1, T), DTYPE)
    noises = jax.random.normal(key, (N, 1, 1, T), DTYPE)

    # cheap sections first so partial results survive a timeout
    ups = ConvInUpsampleNetwork((4, 4, 4, 5), dtype=DTYPE)
    mel_t = jnp.swapaxes(mel, 1, 2)
    mels_t = jnp.swapaxes(mels, 2, 3)
    pu = jax.jit(ups.init)(jax.random.PRNGKey(2), mel_t)
    print(f"upsample net:       "
          f"{scan_time(ups.apply, pu, mels_t, iters=N):8.2f} ms", flush=True)

    blk = ResidualBlock(dilation=64, dtype=DTYPE)
    hs = jax.random.normal(key, (N, 1, T, 64), DTYPE)
    c = jax.random.normal(key, (1, T, 80), DTYPE)
    pb = jax.jit(blk.init)(jax.random.PRNGKey(4), hs[0], c)
    ms = scan_time(blk.apply, pb, hs, fixed=(c,), iters=N)
    print(f"1 res layer(d64):   {ms:8.2f} ms", flush=True)

    skip0 = jnp.zeros((1, T + (-T) % 4096, 64), jnp.float32)
    hs_pad = jnp.pad(hs, ((0, 0), (0, 0), (0, (-T) % 4096), (0, 0)))
    c_pad = jnp.pad(c, ((0, 0), (0, (-T) % 4096), (0, 0)))
    fn = lambda p, h, cc, ss: blk.apply(p, h, cc, skip=ss, t_real=T)
    ms = scan_time(fn, pb, hs_pad, fixed=(c_pad, skip0), iters=N)
    print(f"1 fused layer(d64): {ms:8.2f} ms", flush=True)

    voc_f = ParallelWaveGANGenerator(dtype=DTYPE, fused_inference=True)
    p = jax.jit(voc_f.init)(jax.random.PRNGKey(1), noise, mel)
    ms = scan_time(voc_f.apply, p, noises, fixed=(mel,), iters=N)
    print(f"FUSED generator:    {ms:8.2f} ms", flush=True)

    voc = ParallelWaveGANGenerator(dtype=DTYPE)
    ms = scan_time(voc.apply, p, noises, fixed=(mel,), iters=N)
    print(f"full generator:     {ms:8.2f} ms", flush=True)

    # WaveNet stack alone: run the generator with pre-upsampled conditioning
    voc_nu = ParallelWaveGANGenerator(use_upsample=False, dtype=DTYPE)
    c_full = jnp.zeros((1, 80, T), DTYPE)
    pn = jax.jit(voc_nu.init)(jax.random.PRNGKey(3), noise, c_full)
    ms = scan_time(voc_nu.apply, pn, noises, fixed=(c_full,), iters=N)
    print(f"wavenet stack:      {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
