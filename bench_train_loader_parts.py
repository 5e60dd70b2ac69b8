"""Decompose the loader-fed step time: host loader vs caption encode vs
host->device transfer vs device step dispatch/sync.

Companion to bench_train_loader.py (which measured 0.58 steps/s loader-fed vs
21.5 device-only). Prints per-part ms/step to stderr.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench_train_loader import DATA, gen_data


def main():
    import os

    if not os.path.exists(f"{DATA}/manifests/music.tsv"):
        gen_data()

    import jax
    import jax.numpy as jnp

    from versband_tpu.utils.config import (apply_dot_overrides,
                                           instantiate_from_config,
                                           load_config)

    cfg = load_config("/root/repo/configs/vocal2music.yaml")
    cfg = apply_dot_overrides(cfg, [
        f"data.params.main_spec_dir_path={DATA}/manifests",
        f"data.params.other_condition={DATA}/midi.npy",
        "data.params.num_workers=4",
    ])
    datamodule = instantiate_from_config(cfg["data"])
    datamodule.setup()
    loader = datamodule.train_dataloader()

    N = 24
    it = iter(loader)
    first = next(it)  # warm the worker threads
    t0 = time.perf_counter()
    batches = [next(it) for _ in range(N)]
    t_loader = (time.perf_counter() - t0) / N * 1e3
    print(f"loader alone:        {t_loader:8.1f} ms/batch", file=sys.stderr)

    # caption path: tokenize + jitted tiny-T5 encode (sync)
    from versband_tpu.text.embedders import TextVocalEmbedder

    emb = instantiate_from_config(cfg["model"]["params"]["cond_stage_config"])
    caps = first["caption"]["caption"]
    out = emb({"caption": caps, "acoustic": {}})["caption"]
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for b in batches:
        out = emb({"caption": b["caption"]["caption"], "acoustic": {}})["caption"]
    jax.block_until_ready(out)
    t_cap = (time.perf_counter() - t0) / N * 1e3
    print(f"caption encode sync: {t_cap:8.1f} ms/batch", file=sys.stderr)

    # host->device transfer of the numeric arrays (as the trainer does)
    from versband_tpu.train.trainer import pad_batch_time

    def to_dev(b):
        b = pad_batch_time(
            {**b, "midi": b["caption"]["acoustic"]["midi"],
             "beats": b["caption"]["acoustic"]["beats"]}, 128)
        return {k: jnp.asarray(np.ascontiguousarray(b[k]))
                for k in ("image", "acoustic", "midi", "beats")}

    d = to_dev(first)
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    for b in batches:
        d = to_dev(b)
    jax.block_until_ready(d)
    t_xfer = (time.perf_counter() - t0) / N * 1e3
    nbytes = sum(np.prod(v.shape) * v.dtype.itemsize for v in d.values())
    print(f"pad + h2d transfer:  {t_xfer:8.1f} ms/batch "
          f"({nbytes / 1e6:.1f} MB numeric)", file=sys.stderr)

    # RPC floor: transfer of one tiny array, synced
    tiny = np.zeros((8,), np.float32)
    jax.block_until_ready(jnp.asarray(tiny))
    t0 = time.perf_counter()
    for _ in range(N):
        jax.block_until_ready(jnp.asarray(tiny))
    print(f"tiny h2d roundtrip:  {(time.perf_counter() - t0) / N * 1e3:8.1f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
