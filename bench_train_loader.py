"""End-to-end training-throughput bench: steps/s through the REAL pipeline.

Unlike bench_components.py's device-only CFM step (synthetic device batches),
this drives the full `cli/train.py` assembly — SpectrogramDataModule (npy mel
loads, bucketed IndexBatchSampler, threaded DataLoader), caption encoding
through the cond stage, pad_batch_time, host->device transfer, CFMTrainer.fit
— over a generated shipped-size dataset (80x~1500 mels, batch 8, crop 1500,
the `configs/vocal2music.yaml` geometry), and reports loader-fed steps/s to
compare against the device-only number (VERDICT r2 item 7).

One JSON line:
  {"metric": "train_steps_per_sec_loader_fed", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

DATA = "/tmp/bench_train_data"
N_UNIQUE = 12      # distinct mel npys; rows reference them round-robin
N_ROWS = 684       # valid_head=300 val rows + 48 train batches of 8: the
                   # timed 40 steps stay inside epoch 0 (no val epoch)
N_STEPS = int(os.environ.get("BENCH_N_STEPS", 40))
WARM_STEPS = int(os.environ.get("BENCH_WARM_STEPS", 8))  # skip compile/warmup
SYNC_EVERY = int(os.environ.get("BENCH_SYNC_EVERY", 0))  # diag: block per step
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL", 1))
TRANSFER_DTYPE = os.environ.get("BENCH_TRANSFER_DTYPE") or None  # 'float16'
PREFETCH = int(os.environ.get("BENCH_PREFETCH", 1))  # 0 = inline assembly
CAPTION_CACHE = int(os.environ.get("BENCH_CAPTION_CACHE", 0))  # 1 = opt-in cache


def gen_data():
    import pandas as pd

    os.makedirs(f"{DATA}/mels", exist_ok=True)
    os.makedirs(f"{DATA}/manifests", exist_ok=True)
    rng = np.random.default_rng(0)
    mels = []
    for i in range(N_UNIQUE):
        T = int(rng.integers(1440, 1505))
        mel = (rng.standard_normal((80, T)) * 0.5).astype(np.float32)
        voc = (rng.standard_normal((80, T)) * 0.5).astype(np.float32)
        mp, vp = f"{DATA}/mels/u{i}_mel.npy", f"{DATA}/mels/u{i}_vocal_mel.npy"
        np.save(mp, mel)
        np.save(vp, voc)
        mels.append((mp, vp, T))
    rows, midi_d, beats_d = [], {}, {}
    for j in range(N_ROWS):
        mp, vp, T = mels[j % N_UNIQUE]
        name = f"song{j}"
        midi_d[name] = rng.integers(0, 128, T).astype(np.int64)
        beats_d[name] = rng.integers(0, 2, T).astype(np.int64)
        rows.append(dict(name=name, dataset="bench", mel_path=mp,
                         vocal_mel_path=vp, duration=T / 75.0,
                         caption="piano<psep>a soft piano accompaniment",
                         key="C major", key_confidence=0.9, avg_pitch=66.0,
                         tempo=100.0, tempo_confidence=0.9,
                         emotion="['calm']", wav_len=T / 75.0))
    pd.DataFrame(rows).to_csv(f"{DATA}/manifests/music.tsv", sep="\t",
                              index=False)
    np.save(f"{DATA}/midi.npy", midi_d, allow_pickle=True)
    np.save(f"{DATA}/beats.npy", beats_d, allow_pickle=True)


class NoCkpt:
    """Checkpoint-manager stub: every save/restore is a no-op."""

    def save_last(self, *a, **k): pass
    def save_monitored(self, *a, **k): pass
    def save_step_archive(self, *a, **k): pass
    def restore_last(self, *a, **k): return None
    def last_step(self): return 0


T0 = time.perf_counter()


def mark(msg):
    print(f"# [{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    # regenerate when the generation constants change: a stale /tmp dataset
    # from an older script version would silently benchmark a different
    # workload
    stamp_path = f"{DATA}/gen_stamp.txt"
    stamp = f"N_UNIQUE={N_UNIQUE} N_ROWS={N_ROWS} v2"
    fresh = (os.path.exists(f"{DATA}/manifests/music.tsv")
             and os.path.exists(stamp_path)
             and open(stamp_path).read() == stamp)
    if not fresh:
        gen_data()
        with open(stamp_path, "w") as f:
            f.write(stamp)
    mark("data ready")

    import jax

    from versband_tpu.train.callbacks import Callback
    from versband_tpu.train.checkpoints import CheckpointManager
    from versband_tpu.train.trainer import CFMTrainer
    from versband_tpu.utils.config import (apply_dot_overrides,
                                           instantiate_from_config,
                                           load_config)

    cfg = load_config("/root/repo/configs/vocal2music.yaml")
    cfg = apply_dot_overrides(cfg, [
        f"data.params.main_spec_dir_path={DATA}/manifests",
        f"data.params.other_condition={DATA}/midi.npy",
        "data.params.num_workers=4",
        # offline: the T5 dir is absent -> the tower falls back to a
        # random-init encoder with the REAL tokenize/encode call pattern
    ])
    datamodule = instantiate_from_config(cfg["data"])
    datamodule.setup()
    mark("datamodule up")

    cfm = instantiate_from_config(cfg["model"])
    mark("model instantiated")
    import jax.numpy as jnp
    mel0 = jnp.zeros((1, 80, 256))
    vae_params = jax.jit(cfm.first_stage.init)(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        mel0)
    mark("vae init")

    class Timer(Callback):
        def __init__(self):
            self.t_warm = None
            self.warm_step = 0
            self.done = 0

        def on_train_batch_end(self, trainer, batch, metrics, step):
            self.done = step
            if SYNC_EVERY and step % SYNC_EVERY == 0:
                mark(f"step {step} dispatched; syncing loss...")
                mark(f"step {step} loss={float(metrics['loss']):.4f}")
            if step <= 2 or step == WARM_STEPS:
                mark(f"step {step} done")
            if step >= WARM_STEPS and self.t_warm is None:
                # sync on ONE scalar: block_until_ready on the params TREE
                # polls ~400 buffers through the tunnel (~40-70 s of pure
                # RPC) and poisons the measurement
                float(np.asarray(metrics["loss"]))
                self.t_warm = time.perf_counter()
                self.warm_step = step

    timer = Timer()
    trainer = CFMTrainer(
        cfm, vae_params, cfm.cond_stage, learning_rate=1e-4,
        steps_per_call=STEPS_PER_CALL, prefetch_groups=PREFETCH,
        transfer_dtype=TRANSFER_DTYPE,
        caption_cache_dir="auto" if CAPTION_CACHE else None,
        use_ema=False, scheduler=None, mesh=None,
        logdir="/tmp/bench_train_logs", max_steps=N_STEPS, max_epochs=99,
        val_every_n_epochs=10 ** 6,  # throughput bench: keep validation out
        callbacks=[timer], ckpt=NoCkpt(),  # end-of-fit orbax save would
        # gather ~0.5 GB of state through the tunnel — not part of steps/s
        seed=0, log_every_n_steps=10 ** 6, use_tensorboard=False)

    t0 = time.perf_counter()
    trainer.fit(datamodule)
    # honest end sync: scalar READBACK, not block_until_ready (the axon
    # relay acks block_until_ready before execution completes —
    # docs/BENCH_NOTES.md "Honest timing")
    float(np.asarray(trainer.state.step))
    t1 = time.perf_counter()
    assert timer.t_warm is not None and timer.done >= N_STEPS
    steps = timer.done - timer.warm_step
    sps = steps / (t1 - timer.t_warm)
    print(f"# total wall (incl. compile) {t1 - t0:.1f}s; timed {steps} steps",
          file=sys.stderr)
    print(json.dumps({
        "metric": "train_steps_per_sec_loader_fed", "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 21.5, 3)}))  # device-only fp32 number


if __name__ == "__main__":
    main()
