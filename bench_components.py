"""BASELINE configs 1-3 component benchmarks + training step throughput.

One JSON line per metric (the driver's headline stays in bench.py):
  1. mel extraction  — 10 s 24 kHz wav -> log-mel (``preprocess/mel_spec_24k``
     path; BASELINE.json config 1)
  2. HiFi-GAN vocode — single 20 s mel -> 24 kHz wav (config 2)
  3. VAE round-trip  — ``ae_accomp.yaml`` mel encode+decode (config 3)
  4. CFM train step  — full-size ``vocal2music.yaml`` step (frozen-VAE encode
     + Band-MOE DiT flow-matching loss + AdamW), batch 8, crop 1500

Timing via the on-device ``lax.scan`` harness (scalar readback, RPC floor
subtracted) — see docs/BENCH_NOTES.md "Honest timing".
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

SR = 24000
HOP = 320


def _rpc_floor(example, n):
    @jax.jit
    def floor_run(ms):
        s, _ = jax.lax.scan(lambda c, m: (c + jnp.sum(m.astype(jnp.float32)),
                                          None), 0.0, ms)
        return s
    float(floor_run(example))  # compile + warm
    ex2 = jax.block_until_ready(example + 1.0)  # distinct timed args
    t0 = time.perf_counter()
    float(floor_run(ex2))
    return (time.perf_counter() - t0) * 1e3


def bench_mel():
    from versband_tpu.dsp.mel import MelSpectrogram

    N, secs = 8, 10.0
    L = int(SR * secs)
    wavs = jax.random.uniform(jax.random.PRNGKey(0), (N, 1, L),
                              jnp.float32, -0.5, 0.5)
    mel = MelSpectrogram()
    floor = _rpc_floor(wavs, N)

    @jax.jit
    def run(ms):
        def body(c, w):
            m = mel._forward(w)
            return c + jnp.sum(m), None
        s, _ = jax.lax.scan(body, 0.0, ms)
        return s

    float(run(wavs))  # compile + warm
    # timed pass on DIFFERENT data: identical args can hit a relay fast path
    wavs2 = jax.block_until_ready(wavs * 1.0001)
    t0 = time.perf_counter()
    float(run(wavs2))
    ms_per = ((time.perf_counter() - t0) * 1e3 - floor) / N
    rtf = secs / (ms_per / 1e3)
    print(json.dumps({"metric": "mel_extract_rtf", "value": round(rtf, 1),
                      "unit": "x_realtime", "vs_baseline": round(rtf / 10, 3)}))


def bench_vocoder():
    from versband_tpu.vocoder.hifigan import HifiGanGenerator

    N, T = 8, 1504
    mels = jax.random.normal(jax.random.PRNGKey(0), (N, 1, 80, T), jnp.float32)
    gen = HifiGanGenerator(dtype=jnp.bfloat16)
    p = jax.jit(gen.init)(jax.random.PRNGKey(1), mels[0].astype(jnp.bfloat16))
    floor = _rpc_floor(mels, N)

    @jax.jit
    def run(p, ms):
        def body(c, m):
            w = gen.apply(p, m.astype(jnp.bfloat16))
            return c + jnp.sum(w.astype(jnp.float32)), None
        s, _ = jax.lax.scan(body, 0.0, ms)
        return s

    float(run(p, mels))  # compile + warm
    mels2 = jax.block_until_ready(mels * 1.0001)  # distinct timed args
    t0 = time.perf_counter()
    float(run(p, mels2))
    ms_per = ((time.perf_counter() - t0) * 1e3 - floor) / N
    secs = T * HOP / SR
    rtf = secs / (ms_per / 1e3)
    print(json.dumps({"metric": "hifigan_vocode_rtf", "value": round(rtf, 1),
                      "unit": "x_realtime", "vs_baseline": round(rtf / 10, 3)}))


def bench_vae_roundtrip():
    from versband_tpu.models.autoencoder import AutoencoderKL

    N, T = 8, 624  # ae_accomp.yaml spec_crop_len
    mels = jax.random.normal(jax.random.PRNGKey(0), (N, 1, 80, T), jnp.float32)
    vae = AutoencoderKL(embed_dim=20, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=20, kernel_size=5,
        ch=384, ch_mult=[1, 2, 4], num_res_blocks=2, attn_layers=[3],
        down_layers=[0], dropout=0.0), dtype=jnp.bfloat16)
    p = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(1), "gaussian": jax.random.PRNGKey(2)},
        mels[0])
    floor = _rpc_floor(mels, N)

    @jax.jit
    def run(p, ms):
        def body(c, m):
            post = vae.apply(p, m, method="encode")
            rec = vae.apply(p, post.mode(), method="decode")
            return c + jnp.sum(rec.astype(jnp.float32)), None
        s, _ = jax.lax.scan(body, 0.0, ms)
        return s

    float(run(p, mels))  # compile + warm
    mels2 = jax.block_until_ready(mels * 1.0001)  # distinct timed args
    t0 = time.perf_counter()
    float(run(p, mels2))
    ms_per = ((time.perf_counter() - t0) * 1e3 - floor) / N
    secs = T * HOP / SR
    rtf = secs / (ms_per / 1e3)
    print(json.dumps({"metric": "vae_roundtrip_rtf", "value": round(rtf, 1),
                      "unit": "x_realtime", "vs_baseline": round(rtf / 10, 3)}))


def bench_train_step():
    from versband_tpu.models.autoencoder import AutoencoderKL
    from versband_tpu.models.cfm import CFM
    from versband_tpu.train.state import TrainState, make_adamw
    from versband_tpu.train.step import make_cfm_train_step

    B, T_MEL = 8, 1504  # shipped vocal2music.yaml: bs 8, crop 1500 (pad 8)
    vae = AutoencoderKL(embed_dim=20, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=20, kernel_size=5,
        ch=384, ch_mult=[1, 2, 4], num_res_blocks=2, attn_layers=[3],
        down_layers=[0], dropout=0.0))
    unet = dict(target="versband_tpu.models.dit.BandMoeDiT",
                params=dict(in_channels=20, context_dim=768, hidden_size=768,
                            depth=4, num_heads=8, max_len=1500, num_experts=4,
                            ori_dim=1024, use_flash=True))
    cfm = CFM(unet_config=unet, mel_dim=20, mel_length=T_MEL // 2,
              scale_by_std=False, scale_factor=1.0)
    cfm.first_stage = vae

    mel0 = jnp.zeros((B, 80, T_MEL))
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        mel0)

    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(2), (B, 80, T_MEL)),
        # ori_dim 1024: the shipped cond tower is flan-t5-large (d_model
        # 1024, configs/vocal2music.yaml:43) — 768 would silently init a
        # smaller caption projection and under-measure the step
        "caption": jax.random.normal(jax.random.PRNGKey(3), (B, 80, 1024)),
        "midi": jax.random.randint(jax.random.PRNGKey(4), (B, 1, T_MEL), 0, 130),
        "beats": jax.random.randint(jax.random.PRNGKey(5), (B, 1, T_MEL), 0, 3),
    }
    from versband_tpu.models.cfm import _cond_to_context
    ctx = _cond_to_context({"caption": batch["caption"],
                            "acoustic": {"midi": batch["midi"],
                                         "beats": batch["beats"]}})
    x0 = jnp.zeros((B, 20, T_MEL // 2))
    params = jax.jit(cfm.model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(6), "gumbel": jax.random.PRNGKey(7)},
        x0, jnp.zeros((B,)), ctx, train=True)

    tx = make_adamw(1e-4, grad_clip=1.0)
    # shipped config trains WITHOUT EMA (vocal2music.yaml use_ema: false);
    # a 0.9999 shadow would add a full per-param update to the timed step
    state = TrainState.create(params, tx, ema_decay=None)
    step_fn = make_cfm_train_step(cfm, vae_params=None)

    N = 5

    @jax.jit
    def run(state, batch, vae_params, base):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_fn(st, batch, jax.random.fold_in(
                base, i), vae_params)
            return (st, metrics["loss"]), None
        (st, loss), _ = jax.lax.scan(body, (state, 0.0), jnp.arange(N))
        return loss

    floor = _rpc_floor(jnp.zeros((N, 8, 8)), N)
    # timed pass uses DIFFERENT keys than the warm pass: identical args can
    # hit a relay fast path through the tunnel and under-report
    float(run(state, batch, vae_params, jax.random.PRNGKey(8)))
    t0 = time.perf_counter()
    float(run(state, batch, vae_params, jax.random.PRNGKey(9)))
    ms_per = ((time.perf_counter() - t0) * 1e3 - floor) / N
    print(json.dumps({"metric": "cfm_train_step_ms", "value": round(ms_per, 1),
                      "unit": "ms/step_bs8",
                      "vs_baseline": round(1000.0 / ms_per, 3)}))


def main():
    bench_mel()
    bench_vocoder()
    bench_vae_roundtrip()
    bench_train_step()


if __name__ == "__main__":
    main()
