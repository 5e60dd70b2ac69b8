"""Static HBM footprint of the shipped training programs (soak companion).

The axon tunnel exposes no runtime ``device.memory_stats()`` (empty dict), so
the soak report cannot record a live watermark. The honest substitute is
XLA's own compile-time accounting: AOT-lower each shipped program with
abstract arguments (``jax.eval_shape`` — nothing is uploaded), compile it for
the real v5e, and read ``compiled.memory_analysis()``. For a fixed-shape,
jit-only training loop this IS the watermark — XLA preallocates argument +
output + temp buffers per program; there is no data-dependent growth
(cf. the reference's CUDA watermark logging at ``main.py:576-596``).

Programs analyzed (same geometry as bench_components.py / the soak):
  stage2_cfm  — fused CFM train step, bs 8, mel 80x1504 (vocal2music.yaml)
  stage1_gan  — VAE-GAN dual-optimizer step, bs 20, crop 624 (ae_accomp.yaml)

Prints one JSON line per program:
  {"program": ..., "args_mib": ..., "temp_mib": ..., "out_mib": ...,
   "total_mib": ...}
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def _report(name, compiled):
    m = compiled.memory_analysis()
    mib = 1024 ** 2
    args = m.argument_size_in_bytes / mib
    temp = m.temp_size_in_bytes / mib
    out = m.output_size_in_bytes / mib
    # args/outputs alias for donated/updated state; XLA reports alias_size
    alias = getattr(m, "alias_size_in_bytes", 0) / mib
    print(json.dumps({
        "program": name, "args_mib": round(args, 1),
        "temp_mib": round(temp, 1), "out_mib": round(out, 1),
        "alias_mib": round(alias, 1),
        "total_mib": round(args + temp + out - alias, 1)}))


def stage2_cfm():
    from versband_tpu.models.autoencoder import AutoencoderKL
    from versband_tpu.models.cfm import CFM
    from versband_tpu.train.state import TrainState, make_adamw
    from versband_tpu.train.step import make_cfm_train_step

    B, T_MEL = 8, 1504
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
    vae_params = jax.eval_shape(vae.init, {
        "params": jax.random.PRNGKey(0),
        "gaussian": jax.random.PRNGKey(1)}, mel0)

    batch = {
        "image": jax.ShapeDtypeStruct((B, 80, T_MEL), jnp.float32),
        "caption": jax.ShapeDtypeStruct((B, 80, 1024), jnp.float32),
        "midi": jax.ShapeDtypeStruct((B, 1, T_MEL), jnp.int32),
        "beats": jax.ShapeDtypeStruct((B, 1, T_MEL), jnp.int32),
    }
    from versband_tpu.models.cfm import _cond_to_context
    ctx_shape = jax.eval_shape(
        lambda c, m, b: _cond_to_context(
            {"caption": c, "acoustic": {"midi": m, "beats": b}}),
        batch["caption"], batch["midi"], batch["beats"])
    x0 = jnp.zeros((B, 20, T_MEL // 2))
    params = jax.eval_shape(
        lambda r, x, t, c: cfm.model.init(r, x, t, c, train=True),
        {"params": jax.random.PRNGKey(6), "gumbel": jax.random.PRNGKey(7)},
        jax.ShapeDtypeStruct(x0.shape, x0.dtype),
        jax.ShapeDtypeStruct((B,), jnp.float32), ctx_shape)

    tx = make_adamw(1e-4, grad_clip=1.0)
    state = jax.eval_shape(
        lambda p: TrainState.create(p, tx, ema_decay=None), params)
    step_fn = make_cfm_train_step(cfm, vae_params=None)

    def one_step(state, batch, vae_params, key):
        st, metrics = step_fn(state, batch, key, vae_params)
        return st, metrics["loss"]

    compiled = jax.jit(one_step).lower(
        _abstract(state), batch, _abstract(vae_params),
        jax.ShapeDtypeStruct((2,), jnp.uint32)).compile()
    _report("stage2_cfm_train_step_bs8", compiled)


def stage1_gan():
    import functools

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
    mel = jax.ShapeDtypeStruct((B, 80, T), jnp.float32)
    vae_params = jax.eval_shape(vae.init, {
        "params": jax.random.PRNGKey(1),
        "gaussian": jax.random.PRNGKey(2)}, mel)
    loss_params = jax.eval_shape(
        functools.partial(loss.init, method="disc_forward"),
        jax.random.PRNGKey(3), mel)
    tx = make_adam(4.5e-6, betas=(0.5, 0.9))
    gen_state = jax.eval_shape(lambda p: TrainState.create(p, tx), vae_params)
    disc_state = jax.eval_shape(lambda p: TrainState.create(p, tx),
                                loss_params)
    step_fn = make_vae_train_step(vae, loss)

    def one_step(gs, ds, mel, key):
        gs, ds, m = step_fn(gs, ds, {"image": mel}, key)
        return gs, ds, m["aeloss"]

    compiled = jax.jit(one_step).lower(
        _abstract(gen_state), _abstract(disc_state), mel,
        jax.ShapeDtypeStruct((2,), jnp.uint32)).compile()
    _report("stage1_vae_gan_step_bs20", compiled)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stage2", "all"):
        stage2_cfm()
    if which in ("stage1", "all"):
        stage1_gan()
