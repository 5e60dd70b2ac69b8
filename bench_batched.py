"""BASELINE config 5: batched multi-song prompt-controlled generation with a
HiFi-GAN / BigVGAN / ParallelWaveGAN vocoder sweep.

Streams a queue of multi-song requests through ``sample.pipeline.
PipelinedGenerator`` (sampler -> VAE decode -> vocoder, software-pipelined
async stages, ``encode_once`` conditioning hoist) and reports songs/sec/chip
per vocoder plus the single-song RTF. Reference workload definition:
``scripts/test_final.py:349-465`` looped over items (the reference has no
batched path — it vocodes one item at a time per GPU).

Prints one JSON line per vocoder:
  {"metric": "songs_per_sec_<vocoder>", "value": N, "unit": "songs/s",
   "vs_baseline": RTF/10}
(the driver's headline metric stays in bench.py).
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
T_MEL = 1504          # 20 s at 75 fps
T_LAT = T_MEL // 2
ODE_STEPS = 25
CFG_SCALE = 2.0
BATCH = 4             # songs per device batch
N_REQUESTS = 6        # batches streamed through the pipeline
DTYPE = jnp.bfloat16


def build():
    from versband_tpu.models.autoencoder import AutoencoderKL
    from versband_tpu.models.cfm import CFM, euler_cfg_sample

    vae = AutoencoderKL(embed_dim=20, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=20, kernel_size=5,
        ch=384, ch_mult=[1, 2, 4], num_res_blocks=2, attn_layers=[3],
        down_layers=[0], dropout=0.0), dtype=DTYPE)
    unet = dict(target="versband_tpu.models.dit.BandMoeDiT",
                params=dict(in_channels=20, context_dim=768, hidden_size=768,
                            depth=4, num_heads=8, max_len=1500, num_experts=4,
                            ori_dim=1024, use_flash=True, dtype=DTYPE))
    cfm = CFM(unet_config=unet, mel_dim=20, mel_length=T_LAT,
              scale_by_std=False, scale_factor=1.0)

    B = BATCH
    cond = {
        "caption": jnp.zeros((B, 80, 1024), DTYPE),
        "acoustic": {
            "midi": jnp.zeros((B, 1, T_MEL), jnp.int32),
            "beats": jnp.zeros((B, 1, T_MEL), jnp.int32),
        },
    }
    uncond = jax.tree_util.tree_map(jnp.zeros_like, cond)
    x_lat = jnp.zeros((B, 20, T_LAT), DTYPE)
    t0 = jnp.zeros((B,), jnp.float32)

    from versband_tpu.models.cfm import _cond_to_context
    dit_params = jax.jit(cfm.model.init)(
        jax.random.PRNGKey(0), x_lat, t0, _cond_to_context(cond))
    mel0 = jnp.zeros((B, 80, T_MEL), DTYPE)
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(1), "gaussian": jax.random.PRNGKey(2)},
        mel0)

    @jax.jit
    def sample_fn(dit_p, key):
        z0 = jax.random.normal(key, (B, 20, T_LAT), DTYPE)
        return euler_cfg_sample(cfm.model.apply, dit_p, z0, cond, uncond,
                                guidance_scale=CFG_SCALE, num_steps=ODE_STEPS,
                                encode_once=True)

    @jax.jit
    def decode_fn(vae_p, z):
        return vae.apply(vae_p, z.astype(DTYPE), method="decode")

    # vocoders are built LAZILY (one resident at a time: the PWG WaveNet at
    # 480k samples is HBM-hungry, and the sweep shouldn't pay for all three
    # parameter sets at once)
    def make_vocoder(name):
        if name == "hifigan":
            from versband_tpu.vocoder.hifigan import HifiGanGenerator
            voc = HifiGanGenerator(dtype=DTYPE)
            p = jax.jit(voc.init)(jax.random.PRNGKey(3), mel0)
            return jax.jit(voc.apply), p
        if name == "bigvgan":
            from versband_tpu.vocoder.bigvgan import BigVGANGenerator
            voc = BigVGANGenerator(dtype=DTYPE)
            p = jax.jit(voc.init)(jax.random.PRNGKey(4), mel0)
            return jax.jit(voc.apply), p
        if name == "pwg":
            from versband_tpu.vocoder.pwg import ParallelWaveGANGenerator
            voc = ParallelWaveGANGenerator(dtype=DTYPE, fused_inference=True)
            # aux_context_window=2 trims 2 mel frames per side
            noise0 = jnp.zeros((1, 1, (T_MEL - 4) * HOP), DTYPE)
            p = jax.jit(voc.init)(jax.random.PRNGKey(5), noise0,
                                  mel0[:1])

            @jax.jit
            def pwg_one(p, mel1):
                noise = jax.random.normal(
                    jax.random.PRNGKey(6),
                    (1, 1, (mel1.shape[2] - 4) * HOP), DTYPE)
                return voc.apply(p, noise, mel1)

            def pwg_apply(p, mel):
                # the 30-layer WaveNet at 480k samples: one song per call
                return jnp.concatenate(
                    [pwg_one(p, mel[i:i + 1]) for i in range(mel.shape[0])])

            return pwg_apply, p
        raise KeyError(name)

    return sample_fn, dit_params, decode_fn, vae_params, make_vocoder


def main():
    from versband_tpu.sample.pipeline import PipelinedGenerator

    sample_fn, dit_p, decode_fn, vae_p, make_vocoder = build()
    key = jax.random.PRNGKey(42)
    audio_s = T_MEL * HOP / SR

    for name in ("hifigan", "bigvgan", "pwg"):
        voc_apply, voc_p = make_vocoder(name)
        gen = PipelinedGenerator(
            sample_fn=lambda cond, k: sample_fn(dit_p, k),
            decode_fn=lambda z: decode_fn(vae_p, z),
            vocode_fn=lambda mel: voc_apply(voc_p, mel),
            depth=2)

        reqs = [(None, jax.random.fold_in(key, 100 + i)) for i in range(2)]
        for _ in gen.generate(reqs):  # compile + warm
            pass

        reqs = [(None, jax.random.fold_in(key, i)) for i in range(N_REQUESTS)]
        t0 = time.perf_counter()
        n_wavs = 0
        for wav in gen.generate(reqs):
            n_wavs += wav.shape[0]
        wall = time.perf_counter() - t0
        songs_per_sec = n_wavs / wall
        rtf = songs_per_sec * audio_s
        print(json.dumps({"metric": f"songs_per_sec_{name}",
                          "value": round(songs_per_sec, 3),
                          "unit": "songs/s",
                          "vs_baseline": round(rtf / 10.0, 3)}))
        del voc_apply, voc_p


if __name__ == "__main__":
    main()
