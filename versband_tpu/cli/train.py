"""Training CLI — the ``main.py`` equivalent.

Usage (mirrors ``main.py:599-888`` / README.md:72-83):

    python -m versband_tpu.cli.train --base configs/ae_accomp.yaml -t
    python -m versband_tpu.cli.train --base configs/vocal2music.yaml -t \
        --max_steps 100000 name.of.key=value ...

  * multi-yaml ``--base`` merge + dotlist overrides (``main.py:650-652``);
  * ``-r <logdir>`` resume: re-globs ``<logdir>/configs/*.yaml`` and restores
    the last checkpoint (``main.py:614-630``);
  * LR scaling ``lr = accum * ndevices * bs * base_lr`` unless
    ``--scale_lr false`` (``main.py:823-831``);
  * logdir layout ``logs/<now>_<name>/{checkpoints,configs,tb,images,audio}``;
  * SIGUSR1 -> checkpoint (handled by the trainer).

Dispatches to ``VAETrainer`` (stage 1) or ``CFMTrainer`` (stage 2) by the
configured model class.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import os
import sys
from typing import List

import jax
import numpy as np

from versband_tpu.utils.config import (
    Config, apply_dot_overrides, instantiate_from_config, load_config,
    merge_configs)


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("versband_tpu trainer")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-b", "--base", nargs="*", metavar="base_config.yaml",
                   default=[])
    p.add_argument("-t", "--train", action="store_true", default=False)
    p.add_argument("--no-test", action="store_true", default=False)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--devices", type=int, default=None,
                   help="number of devices for the data mesh (default: all)")
    p.add_argument("--n_model", type=int, default=1,
                   help="model-parallel axis size")
    p.add_argument("--scale_lr", type=str, default="true")
    p.add_argument("--max_steps", type=int, default=10 ** 9)
    p.add_argument("--max_epochs", type=int, default=1000)
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="fuse K train steps into one lax.scan program "
                        "(single-chip stage 2): pays per-program dispatch "
                        "latency once per K steps")
    p.add_argument("--prefetch_groups", type=int, default=1,
                   help="batches/groups assembled+transferred ahead on a "
                        "worker thread (stage 2, single-chip); 0 = inline")
    p.add_argument("--transfer_dtype", type=str, default=None,
                   choices=(None, "float16"),
                   help="wire-compress host->device transfers (mels fp16, "
                        "ids int16; widened back on device). Halves h2d "
                        "bytes at the cost of fp16-rounding the input mels")
    p.add_argument("--caption_cache_dir", type=str, default=None,
                   help="persistent frozen-tower caption-embedding cache "
                        "('auto' = <logdir>/caption_cache). OPT-IN: only "
                        "wins when the caption set is small and fixed; "
                        "randomized-template datasets never warm it (see "
                        "docs/BENCH_NOTES.md)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (cpu/tpu); overrides the "
                        "environment plugin selection")
    return p


def build_logdir(opt, now: str) -> str:
    if opt.resume:
        return opt.resume.rstrip("/")
    cfg_name = (opt.name or
                (os.path.splitext(os.path.basename(opt.base[0]))[0]
                 if opt.base else "run"))
    return os.path.join(opt.logdir, f"{now}_{cfg_name}")


def main(argv: List[str] = None) -> int:
    opt, unknown = get_parser().parse_known_args(argv)
    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
        if opt.platform == "cpu" and opt.devices and opt.devices > 1:
            # virtual multi-device CPU mesh for sharding tests/dev
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    f"{flags} --xla_force_host_platform_device_count="
                    f"{opt.devices}")
    now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")

    bases = list(opt.base)
    if opt.resume:
        bases = sorted(glob.glob(os.path.join(opt.resume, "configs/*.yaml"))) \
            + bases
    if not bases:
        print("no --base config given", file=sys.stderr)
        return 2
    config: Config = Config.wrap({})
    for b in bases:
        config = merge_configs(config, load_config(b))
    config = apply_dot_overrides(config, unknown)

    logdir = build_logdir(opt, now)
    ckptdir = os.path.join(logdir, "checkpoints")
    cfgdir = os.path.join(logdir, "configs")

    np.random.seed(opt.seed)

    model_cfg = config["model"]
    data_cfg = config["data"]
    lightning_cfg = config.get("lightning", Config.wrap({}))

    datamodule = instantiate_from_config(data_cfg)
    datamodule.setup()

    # LR scaling (main.py:823-831)
    ndev = opt.devices or jax.local_device_count()
    bs = data_cfg["params"]["batch_size"]
    base_lr = float(model_cfg.get("base_learning_rate", 1e-4))
    if opt.scale_lr.lower() in ("true", "1", "yes"):
        lr = opt.accumulate_grad_batches * ndev * bs * base_lr
        print(f"Setting learning rate to {lr:.2e} = {opt.accumulate_grad_batches}"
              f" (accumulate) * {ndev} (devices) * {bs} (bs) * {base_lr:.2e} (base)")
    else:
        lr = base_lr
        print(f"Using base learning rate {lr:.2e}")

    from versband_tpu.train.callbacks import (
        DeviceStatsCallback, SetupCallback)
    from versband_tpu.train.checkpoints import CheckpointManager

    callbacks = [SetupCallback(bool(opt.resume), now, logdir, ckptdir, cfgdir,
                               config, lightning_cfg),
                 DeviceStatsCallback()]
    cb_cfgs = (lightning_cfg.get("callbacks") or {})
    for name, cb_cfg in cb_cfgs.items():
        try:
            callbacks.append(instantiate_from_config(cb_cfg))
        except Exception as e:
            print(f"callback {name} unavailable: {e}")

    target = model_cfg["target"]
    monitor = model_cfg.get("params", {}).get("monitor")
    ckpt = CheckpointManager(ckptdir, monitor=monitor,
                             every_n_train_steps=10000)
    common = dict(logdir=logdir, max_steps=opt.max_steps,
                  max_epochs=opt.max_epochs, callbacks=callbacks, ckpt=ckpt,
                  seed=opt.seed)

    if "autoencoder" in target.lower() or target.endswith("AutoencoderKL"):
        from versband_tpu.models.autoencoder import AutoencoderKL
        from versband_tpu.train.trainer import VAETrainer

        params = dict(model_cfg.get("params", {}))
        loss_cfg = params.pop("lossconfig", None)
        vae = AutoencoderKL(embed_dim=params["embed_dim"],
                            ddconfig=params.get("ddconfig"),
                            monitor=params.get("monitor"))
        loss = instantiate_from_config(loss_cfg) if loss_cfg else None
        mesh = None
        if (opt.devices or jax.device_count()) > 1:
            from versband_tpu.parallel import make_mesh

            n_dev = opt.devices or jax.device_count()
            mesh = make_mesh(n_dev, 1, jax.devices()[:n_dev])
            print(f"Training on mesh {dict(mesh.shape)}")
        trainer = VAETrainer(vae, loss, learning_rate=lr, mesh=mesh,
                             accumulate_grad_batches=opt.accumulate_grad_batches,
                             **common)
    else:
        from versband_tpu.train.trainer import CFMTrainer

        cfm = instantiate_from_config(model_cfg)
        # frozen first stage params
        fs_cfg = model_cfg["params"].get("first_stage_config", {})
        fs_ckpt = (fs_cfg.get("params") or {}).get("ckpt_path")
        vae_params = _init_vae_params(cfm, datamodule, fs_ckpt, opt.seed)
        sched_cfg = model_cfg["params"].get("scheduler_config")
        scheduler = instantiate_from_config(sched_cfg) if sched_cfg else None
        mesh = None
        if (opt.devices or jax.device_count()) > 1:
            from versband_tpu.parallel import make_mesh

            n_dev = opt.devices or jax.device_count()
            mesh = make_mesh(n_dev // opt.n_model, opt.n_model,
                             jax.devices()[:n_dev])
            print(f"Training on mesh {dict(mesh.shape)}")
        trainer = CFMTrainer(
            cfm, vae_params, cfm.cond_stage, learning_rate=lr,
            use_ema=bool(model_cfg["params"].get("use_ema", False)),
            scheduler=scheduler, mesh=mesh,
            steps_per_call=opt.steps_per_call,
            prefetch_groups=opt.prefetch_groups,
            transfer_dtype=opt.transfer_dtype,
            caption_cache_dir=opt.caption_cache_dir,
            accumulate_grad_batches=opt.accumulate_grad_batches, **common)

    if opt.train:
        trainer.fit(datamodule, resume=bool(opt.resume))
        if not opt.no_test:
            # trainer.test after fit unless --no-test (main.py:866-870)
            try:
                trainer.test(datamodule)
            except Exception as e:
                print(f"test pass skipped: {e}")
    return 0


def _init_vae_params(cfm, datamodule, ckpt_path, seed):
    import jax.numpy as jnp

    batch = next(iter(datamodule.train_dataloader()))
    mel = jnp.asarray(batch["image"][:1])
    params = jax.jit(cfm.first_stage.init)(
        {"params": jax.random.PRNGKey(seed),
         "gaussian": jax.random.PRNGKey(seed + 1)}, mel)
    if ckpt_path and os.path.exists(ckpt_path):
        from versband_tpu.train.checkpoints import load_model_checkpoint

        params = load_model_checkpoint(params, ckpt_path)
        print(f"Restored first stage from {ckpt_path}")
    else:
        print("First stage: random init (no ckpt_path found)")
    return params


if __name__ == "__main__":
    raise SystemExit(main())
