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


def bench_vae_gan_step():
    """Stage-1 VAE-GAN step at shipped size (``ae_accomp.yaml``: bs 20,
    crop 624, ch 384): BOTH optimizer phases in one program — generator with
    the adaptive d_weight (two scoped grads wrt decoder.conv_out) and
    discriminator with the R1 double-grad. disc_start=0 puts the bench in the
    post-warm-up regime (all adversarial terms live), the expensive steady
    state of the reference run (``contperceptual.py:125-149``)."""
    from versband_tpu.models.autoencoder import AutoencoderKL
    from versband_tpu.train.gan_losses import VAEGANLoss
    from versband_tpu.train.state import TrainState, make_adam
    from versband_tpu.train.vae_step import make_vae_train_step

    B, T = 20, 624
    vae = AutoencoderKL(embed_dim=20, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=20, kernel_size=5,
        ch=384, ch_mult=[1, 2, 4], num_res_blocks=2, attn_layers=[3],
        down_layers=[0], dropout=0.0))
    loss = VAEGANLoss(disc_start=0, kl_weight=1e-6, disc_weight=0.5,
                      disc_in_channels=1, disc_loss="mse", disc_factor=2.0,
                      r1_reg_weight=3.0)
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, 80, T)) * 0.5
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(1), "gaussian": jax.random.PRNGKey(2)},
        mel)
    import functools

    # jit EVERY init: eager dispatch through the tunnel is ~100x slower
    loss_params = jax.jit(functools.partial(loss.init, method="disc_forward"))(
        jax.random.PRNGKey(3), mel)
    tx = make_adam(4.5e-6, betas=(0.5, 0.9))
    gen_state = TrainState.create(vae_params, tx)
    disc_state = TrainState.create(loss_params, tx)
    step_fn = make_vae_train_step(vae, loss)

    N = 3

    @jax.jit
    def run(gen_state, disc_state, mel, base):
        def body(carry, i):
            gs, ds, _ = carry
            gs, ds, m = step_fn(gs, ds, {"image": mel},
                                jax.random.fold_in(base, i))
            return (gs, ds, m["aeloss"]), None
        (gs, ds, loss_v), _ = jax.lax.scan(
            body, (gen_state, disc_state, 0.0), jnp.arange(N))
        return loss_v

    floor = _rpc_floor(jnp.zeros((N, 8, 8)), N)
    float(run(gen_state, disc_state, mel, jax.random.PRNGKey(8)))
    t0 = time.perf_counter()
    float(run(gen_state, disc_state, mel, jax.random.PRNGKey(9)))
    ms_per = ((time.perf_counter() - t0) * 1e3 - floor) / N
    print(json.dumps({"metric": "vae_gan_train_step_ms",
                      "value": round(ms_per, 1), "unit": "ms/step_bs20",
                      "vs_baseline": round(1000.0 / ms_per, 3)}))


def bench_hifigan_gan_step():
    """HiFi-GAN GAN step (MPD periods 2-11 + MSD, feature-matching + mel L1,
    ``vocoder/hifigan/modules/hifigan.py:198-382`` recipe) at the standard
    training geometry: bs 16, 8192-sample segments (25.6 mel frames -> 26)."""
    from versband_tpu.dsp.mel import MelSpectrogram
    from versband_tpu.train.state import TrainState, make_adamw
    from versband_tpu.train.vocoder_step import make_hifigan_train_step
    from versband_tpu.vocoder.discriminators import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from versband_tpu.vocoder.hifigan import HifiGanGenerator

    B, T_mel = 16, 26
    gen = HifiGanGenerator()  # shipped 320x geometry, weight-norm training
    mpd = MultiPeriodDiscriminator()  # periods (2, 3, 5, 7, 11)
    msd = MultiScaleDiscriminator()
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, 80, T_mel))
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, T_mel * HOP)) * 0.1
    y = wav[:, None, :]
    gp = jax.jit(gen.init)(jax.random.PRNGKey(2), mel)
    dp = {"mpd": jax.jit(mpd.init)(jax.random.PRNGKey(3), y, y),
          "msd": jax.jit(msd.init)(jax.random.PRNGKey(4), y, y)}
    gen_state = TrainState.create(gp, make_adamw(2e-4))
    disc_state = TrainState.create(dp, make_adamw(2e-4))
    melnet = MelSpectrogram()

    def mel_fn(w):
        return melnet._forward(w)  # [B, T] -> [B, 80, frames]

    step_fn = make_hifigan_train_step(gen, mpd, msd, mel_fn)

    N = 3

    @jax.jit
    def run(gen_state, disc_state, batch):
        def body(carry, _):
            gs, ds, _ = carry
            gs, ds, m = step_fn(gs, ds, batch)
            return (gs, ds, m["gen_loss"]), None
        (gs, ds, loss_v), _ = jax.lax.scan(
            body, (gen_state, disc_state, 0.0), jnp.arange(N))
        return loss_v

    floor = _rpc_floor(jnp.zeros((N, 8, 8)), N)
    float(run(gen_state, disc_state, {"mel": mel, "wav": wav}))
    batch2 = {"mel": jax.block_until_ready(mel * 1.0001), "wav": wav}
    t0 = time.perf_counter()
    float(run(gen_state, disc_state, batch2))
    ms_per = ((time.perf_counter() - t0) * 1e3 - floor) / N
    print(json.dumps({"metric": "hifigan_gan_train_step_ms",
                      "value": round(ms_per, 1), "unit": "ms/step_bs16",
                      "vs_baseline": round(1000.0 / ms_per, 3)}))


BENCHES = {
    "mel": bench_mel,
    "vocoder": bench_vocoder,
    "vae": bench_vae_roundtrip,
    "train": bench_train_step,
    "vae_gan": bench_vae_gan_step,
    "hifigan_gan": bench_hifigan_gan_step,
}


def main():
    import os

    only = os.environ.get("BENCH_ONLY")
    names = only.split(",") if only else list(BENCHES)
    for n in names:
        BENCHES[n]()


if __name__ == "__main__":
    main()
