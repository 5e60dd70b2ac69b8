"""Isolate the loader-fed step-time puzzle on TPU.

Times, with explicit scalar syncs:
  1. h2d transfer of a 31 MB array (the K=8 stacked image batch)
  2. one single CFM train step with inputs already on device
  3. one fused K=8 multi-step with inputs already on device
  4. single step fed by a fresh host array each call (transfer + step)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from versband_tpu.models.cfm import CFM, _cond_to_context
from versband_tpu.train.state import TrainState, make_adamw
from versband_tpu.train.step import make_cfm_multi_step, make_cfm_train_step
from versband_tpu.utils.config import instantiate_from_config, load_config

B, T_MEL = 8, 1536
K = 8


def t(msg, fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{msg:44s} {dt * 1e3:9.1f} ms", flush=True)
    return out


def main():
    cfg = load_config("/root/repo/configs/vocal2music.yaml")
    cfm = instantiate_from_config(cfg["model"])
    vae = cfm.first_stage
    mel0 = jnp.zeros((1, 80, 256))
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        mel0)

    rng = np.random.default_rng(0)
    img_np = rng.standard_normal((K, B, 80, T_MEL)).astype(np.float32)

    # scalar READBACK sync: block_until_ready acks early through the axon
    # relay (documented 0.2 ms ack for a 38 ms op) and would report h2d as
    # free — the opposite of what this script disambiguates
    t("h2d 31MB image stack (synced)",
      lambda: float(jnp.sum(jnp.asarray(img_np))))
    t("h2d 3.9MB single image (synced)",
      lambda: float(jnp.sum(jnp.asarray(img_np[0]))))

    batch1 = {
        "image": jnp.asarray(img_np[0]),
        "caption": jnp.asarray(rng.standard_normal(
            (B, 77, 1024)).astype(np.float32)),
        "midi": jnp.zeros((B, 1, T_MEL), jnp.int32),
        "beats": jnp.zeros((B, 1, T_MEL), jnp.int32),
    }
    batchK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch1)
    batchK = jax.block_until_ready(jax.tree_util.tree_map(jnp.asarray, batchK))

    ctx = _cond_to_context({"caption": batch1["caption"],
                            "acoustic": {"midi": batch1["midi"],
                                         "beats": batch1["beats"]}})
    T_lat = T_MEL // 2
    x = jnp.zeros((B, cfm.mel_dim, T_lat))
    tt = jnp.zeros((B,), jnp.int32)
    params = jax.jit(lambda: cfm.model.init(
        {"params": jax.random.PRNGKey(2), "gumbel": jax.random.PRNGKey(3)},
        x, tt, ctx, train=True))()
    state = TrainState.create(params, make_adamw(1e-4))

    single = jax.jit(make_cfm_train_step(cfm))
    multi = jax.jit(make_cfm_multi_step(cfm))
    key = jax.random.PRNGKey(5)

    st = state

    def run_single():
        nonlocal st
        st, m = single(st, batch1, key, vae_params)
        return float(np.asarray(m["loss"]))

    print("compiling single...", flush=True)
    t("single step, device inputs (synced)", run_single)

    st2 = state

    def run_multi():
        nonlocal st2
        st2, ms = multi(st2, batchK, key, vae_params)
        return float(np.asarray(ms["loss"][-1]))

    print("compiling multi...", flush=True)
    t("K=8 fused, device inputs (synced)", run_multi, n=3)

    def run_single_fresh():
        nonlocal st
        b = dict(batch1, image=jnp.asarray(img_np[0]))
        st, m = single(st, b, key, vae_params)
        return float(np.asarray(m["loss"]))

    t("single step + fresh h2d image (synced)", run_single_fresh)


if __name__ == "__main__":
    main()
