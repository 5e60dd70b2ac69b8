"""Headline benchmark: 20 s accompaniment generation real-time factor, one chip.

Mirrors the reference inference path (``scripts/test_final.py``): 25-step CFM
Euler ODE with CFG (batch-doubled cond+uncond in one call), VAE decode to an
80-bin mel, and HiFi-GAN vocoding to a 24 kHz waveform (skipped with a note if
the vocoder package isn't built yet). Baseline target (BASELINE.md): >= 10x
real time per TPU v5e chip — ``vs_baseline`` is RTF / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
CLIP_S = 20.0
T_MEL = 1504          # ~20 s at 75 fps, multiple of 8 (collate rule)
T_LAT = T_MEL // 2
ODE_STEPS = 25
CFG_SCALE = 2.0
DTYPE = jnp.bfloat16  # production serving dtype; fp32 softmax/matmul accum inside


def build_pipeline():
    from versband_tpu.models.autoencoder import AutoencoderKL
    from versband_tpu.models.cfm import CFM, euler_cfg_sample

    # shipped configs: ae_accomp.yaml / vocal2music.yaml
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

    B = 1
    x_lat = jnp.zeros((B, 20, T_LAT), DTYPE)
    t0 = jnp.zeros((B,), jnp.float32)
    cond = {
        "caption": jnp.zeros((B, 80, 1024), DTYPE),
        "acoustic": {
            "midi": jnp.zeros((B, 1, T_MEL), jnp.int32),
            "beats": jnp.zeros((B, 1, T_MEL), jnp.int32),
        },
    }
    uncond = jax.tree_util.tree_map(jnp.zeros_like, cond)

    from versband_tpu.models.cfm import _cond_to_context
    dit_params = jax.jit(cfm.model.init)(
        jax.random.PRNGKey(0), x_lat, t0, _cond_to_context(cond))
    mel0 = jnp.zeros((B, 80, T_MEL), DTYPE)
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(1), "gaussian": jax.random.PRNGKey(2)}, mel0)

    vocoder_apply = None
    voc_params = None
    try:
        from versband_tpu.vocoder.hifigan import HifiGanGenerator

        # shipped 24 kHz config (hop 320), serving dtype (bf16): fp32 convs
        # at 480k samples run ~20x slower on the MXU — see docs/BENCH_NOTES.md
        voc = HifiGanGenerator(dtype=DTYPE)
        voc_params = jax.jit(voc.init)(jax.random.PRNGKey(3), mel0)
        vocoder_apply = voc.apply
    except Exception as e:  # vocoder milestone not built yet
        print(f"# vocoder unavailable ({type(e).__name__}: {e}); "
              "benchmarking sampler+VAE only", file=sys.stderr)

    # Three separately-jitted stages (sampler / VAE decode / vocoder):
    # smaller programs compile reliably through the axon tunnel, and the
    # staged form is what production serving pipelines anyway (SURVEY §2.10).
    # Params are jit ARGUMENTS (closure constants get baked into the HLO and
    # overflow the remote-compile upload limit — HTTP 413).
    @jax.jit
    def sample_stage(dit_p, key):
        z0 = jax.random.normal(key, (B, 20, T_LAT), DTYPE)
        return euler_cfg_sample(cfm.model.apply, dit_p, z0, cond, uncond,
                                guidance_scale=CFG_SCALE, num_steps=ODE_STEPS,
                                encode_once=True)

    # decode + vocode fused into ONE program: both are small (the 413 upload
    # limit only bites with the 25-step sampler included), and every staged
    # call pays a tunnel RPC round trip.
    if vocoder_apply is not None:
        @jax.jit
        def finish_stage(vae_p, voc_p, z):
            mel = vae.apply(vae_p, z.astype(DTYPE), method="decode")
            return vocoder_apply(voc_p, mel)
    else:
        @jax.jit
        def finish_stage(vae_p, voc_p, z):
            return vae.apply(vae_p, z.astype(DTYPE), method="decode")

    def generate(key):
        z = sample_stage(dit_params, key)
        return finish_stage(vae_params, voc_params, z)

    # --- on-device scan harness (docs/BENCH_NOTES.md "Honest timing"):
    # host-side block_until_ready loops can UNDER-report through the axon
    # tunnel relay, so the N-iteration loop runs on device inside one jitted
    # scan, reduced to a scalar; host reads back one float and the trivial-
    # scan RPC floor is subtracted.
    @jax.jit
    def sample_scan(dit_p, keys):
        def body(acc, key):
            z = sample_stage(dit_p, key)  # jit-of-jit inlines
            return acc + jnp.sum(z.astype(jnp.float32)), z
        acc, zs = jax.lax.scan(body, 0.0, keys)
        return acc, zs

    @jax.jit
    def finish_scan(vae_p, voc_p, zs):
        def body(acc, z):
            out = finish_stage(vae_p, voc_p, z)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, zs)
        return acc

    def timed_scan(n_iter):
        # warm and timed passes use DIFFERENT keys/inputs: byte-identical
        # repeat calls can hit a relay fast path through the axon tunnel
        # and under-report (docs/BENCH_NOTES.md "Honest timing")
        keys_warm = jax.random.split(jax.random.PRNGKey(7), n_iter)
        keys_timed = jax.random.split(jax.random.PRNGKey(8), n_iter)
        # RPC floor: a trivial scan of the same call structure
        @jax.jit
        def floor_run(ms):
            s, _ = jax.lax.scan(
                lambda c, m: (c + jnp.sum(m.astype(jnp.float32)), None),
                0.0, ms)
            return s
        dummy = jnp.zeros((n_iter, 8, 8))
        float(floor_run(dummy))
        dummy2 = jax.block_until_ready(dummy + 1.0)
        t0 = time.perf_counter()
        float(floor_run(dummy2))
        floor_ms = (time.perf_counter() - t0) * 1e3

        acc, zs_warm = sample_scan(dit_params, keys_warm)  # compile + warm
        float(acc)
        t0 = time.perf_counter()
        acc, zs = sample_scan(dit_params, keys_timed)
        float(acc)
        sample_ms = max((time.perf_counter() - t0) * 1e3 - floor_ms, 0.0) \
            / n_iter

        float(finish_scan(vae_params, voc_params, zs_warm))  # compile + warm
        t0 = time.perf_counter()
        acc = finish_scan(vae_params, voc_params, zs)
        float(acc)
        finish_ms = max((time.perf_counter() - t0) * 1e3 - floor_ms, 0.0) \
            / n_iter
        return sample_ms, finish_ms, floor_ms

    return generate, timed_scan, vocoder_apply is not None


def main():
    gen, timed_scan, has_vocoder = build_pipeline()
    audio_s = T_MEL * HOP / SR

    # 1) honest protocol: on-device scan + scalar readback - RPC floor
    n_iter = 8
    sample_ms, finish_ms, floor_ms = timed_scan(n_iter)
    total_ms = sample_ms + finish_ms
    rtf_scan = audio_s / (total_ms / 1e3)

    # 2) legacy host-side loop (known to under-report through the tunnel;
    # kept for cross-checking the two protocols round over round)
    key = jax.random.PRNGKey(42)
    for i in range(3):  # compile + fully warm the dispatch path
        out = gen(jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = gen(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / n_iter
    rtf_host = audio_s / wall

    print(f"# stage breakdown (scan harness, per 20 s clip): "
          f"sampler {sample_ms:.1f} ms, decode+vocode {finish_ms:.1f} ms, "
          f"rpc floor {floor_ms:.1f} ms", file=sys.stderr)
    print(f"# rtf: scan-harness {rtf_scan:.1f}x, host-loop {rtf_host:.1f}x",
          file=sys.stderr)

    metric = ("rtf_20s_accomp_e2e" if has_vocoder else "rtf_20s_accomp_no_vocoder")
    print(json.dumps({"metric": metric, "value": round(rtf_scan, 3),
                      "unit": "x_realtime",
                      "vs_baseline": round(rtf_scan / 10.0, 3)}))


if __name__ == "__main__":
    main()
