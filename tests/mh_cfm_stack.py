"""Shared tiny-CFM stack for the multi-host tests.

Imported by BOTH the pytest process (single-controller reference run) and the
spawned ``jax.distributed`` children (test_multihost.py) so the two runs build
bit-identical models, datasets and batches.
"""

import numpy as np
import jax
import jax.numpy as jnp

C_LAT, T_LAT, ORI = 4, 16, 24
N_ITEMS, BS = 8, 4  # 2 batches of 4 -> one per host


def make_item(i):
    r = np.random.RandomState(1000 + i)
    return {
        "latent": r.randn(C_LAT, T_LAT).astype(np.float32),
        "caption": r.randn(6, ORI).astype(np.float32),
        "midi": r.randint(0, 130, (1, 2 * T_LAT)).astype(np.int32),
        "beats": r.randint(0, 3, (1, 2 * T_LAT)).astype(np.int32),
    }


def collate_items(idxs):
    from versband_tpu.data.collate import collate_1d_or_2d

    items = [make_item(i) for i in idxs]
    out = {}
    for k in items[0]:
        v = np.asarray(collate_1d_or_2d([it[k] for it in items]))
        if k in ("midi", "beats"):  # collate returns float32; ids are ints
            v = v.astype(np.int32)
        out[k] = v
    return out


def build_cfm():
    from versband_tpu.models.cfm import CFM, _cond_to_context
    from versband_tpu.train.state import TrainState, make_adamw
    from versband_tpu.train.step import make_cfm_train_step

    unet = dict(target="versband_tpu.models.dit.BandMoeDiT",
                params=dict(in_channels=C_LAT, context_dim=32, hidden_size=32,
                            depth=1, num_heads=2, max_len=64, num_experts=2,
                            ori_dim=ORI, multiple_of=8))
    cfm = CFM(unet_config=unet, mel_dim=C_LAT, mel_length=T_LAT,
              scale_by_std=False, scale_factor=1.0)
    b = collate_items(range(2))
    ctx = _cond_to_context({"caption": jnp.asarray(b["caption"]),
                            "acoustic": {"midi": jnp.asarray(b["midi"]),
                                         "beats": jnp.asarray(b["beats"])}})
    params = cfm.model.init(
        {"params": jax.random.PRNGKey(6), "gumbel": jax.random.PRNGKey(7)},
        jnp.zeros((2, C_LAT, T_LAT)), jnp.zeros((2,), jnp.int32), ctx,
        train=True)
    tx = make_adamw(1e-3, grad_clip=1.0)
    state = TrainState.create(params, tx, ema_decay=0.999)
    return cfm, state, make_cfm_train_step(cfm)
