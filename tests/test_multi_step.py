"""Fused multi-step training (make_cfm_multi_step / steps_per_call).

One ``lax.scan`` program running K chained train steps must be bitwise
equivalent to K sequential ``make_cfm_train_step`` calls with the same key:
the step fn folds the key with ``state.step``, which advances inside the
scan, so the RNG streams line up exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.cfm import CFM
from versband_tpu.train.state import TrainState, make_adamw
from versband_tpu.train.step import make_cfm_multi_step, make_cfm_train_step


def _tiny_cfm():
    unet = dict(target="versband_tpu.models.dit.BandMoeDiT",
                params=dict(in_channels=4, context_dim=16, hidden_size=16,
                            depth=1, num_heads=2, max_len=32, num_experts=2,
                            ori_dim=12, multiple_of=8))
    return CFM(unet_config=unet, mel_dim=4, scale_by_std=False)


def _batch(key, B=2, T_lat=8, T_mel=16, K=None):
    ks = jax.random.split(key, 2)
    shape = lambda *s: ((K,) + s) if K else s
    return {
        "latent": jax.random.normal(ks[0], shape(B, 4, T_lat)) * 0.5,
        "caption": jax.random.normal(ks[1], shape(B, 4, 12)),
        "midi": jnp.zeros(shape(B, 1, T_mel), jnp.int32),
        "beats": jnp.zeros(shape(B, 1, T_mel), jnp.int32),
    }


@pytest.mark.slow
def test_multi_step_matches_sequential_single_steps():
    cfm = _tiny_cfm()
    K = 3
    key = jax.random.PRNGKey(7)
    batches = _batch(jax.random.PRNGKey(1), K=K)

    from versband_tpu.models.cfm import _cond_to_context

    b0 = jax.tree_util.tree_map(lambda x: x[0], batches)
    ctx = _cond_to_context({"caption": b0["caption"],
                            "acoustic": {"midi": b0["midi"],
                                         "beats": b0["beats"]}})
    x = jnp.zeros((2, 4, 8))
    t = jnp.zeros((2,), jnp.int32)
    params = cfm.model.init({"params": jax.random.PRNGKey(2),
                             "gumbel": jax.random.PRNGKey(3)}, x, t, ctx,
                            train=True)

    single = jax.jit(make_cfm_train_step(cfm))
    st_a = TrainState.create(params, make_adamw(1e-3))
    losses_a = []
    for i in range(K):
        bi = jax.tree_util.tree_map(lambda x: x[i], batches)
        st_a, m = single(st_a, bi, key)
        losses_a.append(float(m["loss"]))

    multi = jax.jit(make_cfm_multi_step(cfm))
    st_b = TrainState.create(params, make_adamw(1e-3))
    st_b, ms = multi(st_b, batches, key)
    losses_b = [float(v) for v in ms["loss"]]

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6)
    assert int(st_b.step) == K
    # params: XLA fuses the scanned program differently from the separate
    # per-step programs, so reductions reassociate; adam's rsqrt amplifies
    # the fp32 noise to ~1e-5 after 3 steps. Same math, different rounding.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4),
        st_a.params, st_b.params)


@pytest.mark.slow
def test_trainer_steps_per_call_flush_partial(tmp_path):
    """The trainer groups K batches per program and single-steps remainders."""
    import flax.linen as fnn

    from versband_tpu.train.trainer import CFMTrainer

    cfm = _tiny_cfm()

    class _Data:
        def train_dataloader(self):
            rng = np.random.default_rng(0)
            for _ in range(5):  # 5 batches, steps_per_call=2 -> 2+2+1
                yield {
                    "image": rng.standard_normal((2, 80, 16)).astype(np.float32),
                    "caption": {
                        "caption": np.asarray(
                            rng.standard_normal((2, 4, 12)), np.float32),
                        "acoustic": {
                            "midi": np.zeros((2, 1, 16), np.int64),
                            "beats": np.zeros((2, 1, 16), np.int64)},
                    },
                }

        def val_dataloader(self):
            raise RuntimeError("no val")

    class _VAE(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return x

    from versband_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(embed_dim=4, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=4, kernel_size=5,
        ch=8, ch_mult=[1, 2], num_res_blocks=1, attn_layers=[],
        down_layers=[0], dropout=0.0))
    cfm.first_stage = vae
    mel0 = jnp.zeros((1, 80, 16))
    vae_params = vae.init({"params": jax.random.PRNGKey(0),
                           "gaussian": jax.random.PRNGKey(1)}, mel0)

    tr = CFMTrainer(cfm, vae_params, None, learning_rate=1e-3,
                    steps_per_call=2, logdir=str(tmp_path), max_steps=5,
                    max_epochs=1, time_bucket=16, use_tensorboard=False,
                    log_every_n_steps=10 ** 6)
    tr.fit(_Data())
    assert tr.global_step == 5
    assert int(tr.state.step) == 5

    # max_steps NOT a multiple of K: the final group must flush short at the
    # boundary instead of overshooting by K-1 steps
    tr3 = CFMTrainer(cfm, vae_params, None, learning_rate=1e-3,
                     steps_per_call=2, logdir=str(tmp_path / "m3"),
                     max_steps=3, max_epochs=1, time_bucket=16,
                     use_tensorboard=False, log_every_n_steps=10 ** 6)
    tr3.fit(_Data())
    assert tr3.global_step == 3
    assert int(tr3.state.step) == 3

    # pre-encoded caption lengths varying across batches (mel bucket equal):
    # the group must flush on the caption-shape change, not np.stack-crash
    class _VarCapData(_Data):
        def train_dataloader(self):
            rng = np.random.default_rng(1)
            for i in range(4):
                cap_len = 4 if i < 2 else 7
                yield {
                    "image": rng.standard_normal(
                        (2, 80, 16)).astype(np.float32),
                    "caption": {
                        "caption": np.asarray(rng.standard_normal(
                            (2, cap_len, 12)), np.float32),
                        "acoustic": {
                            "midi": np.zeros((2, 1, 16), np.int64),
                            "beats": np.zeros((2, 1, 16), np.int64)},
                    },
                }

    trv = CFMTrainer(cfm, vae_params, None, learning_rate=1e-3,
                     steps_per_call=4, logdir=str(tmp_path / "vc"),
                     max_steps=100, max_epochs=1, time_bucket=16,
                     use_tensorboard=False, log_every_n_steps=10 ** 6)
    trv.fit(_VarCapData())
    assert trv.global_step == 4
    assert int(trv.state.step) == 4
