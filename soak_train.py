"""Soak-train harness (VERDICT r4 item 2): long shipped-size training runs
on the real chip, through the shipped CLI path.

Every training claim before round 5 rested on 2-step CLI tests and 3-step
benches; this drives the operator workflow (``cli/train.py`` — the
``main.py:599-888`` analogue, two-stage recipe per the reference
``README.md:72-83``) long enough to catch NaNs, HBM creep, annealing bugs,
and prefetch-thread races:

  stage 2  >=500 consecutive loader-fed CFM steps, shipped vocal2music.yaml
           geometry, prefetch thread + fused K=8 dispatch ON, one SIGUSR1
           checkpoint delivered mid-soak (training continues), run-dir
           snapshotted right after the signal save;
  resume   a FRESH ``cli.train -r <snapshot>`` subprocess restores the
           SIGUSR1 checkpoint and trains 16 more steps (cold-restart proof);
  stage 1  >=200 VAE-GAN steps at shipped size (bs 20, crop 624, ch 384,
           disc_start=0 so both optimizer phases + R1 + adaptive d_weight
           are live from step 1).

Loss curves, sustained steps/s and the HBM watermark are written as one JSON
line per phase to stdout (and ``/tmp/soak_logs/soak_report.json``); scalar
logging rides the trainer's real TB path (``VERSBAND_LOG_HBM=1`` adds the
device watermark at the same cadence).

Usage:  python soak_train.py [stage2|stage1|all]   (default: all)
Knobs:  SOAK_S2_STEPS=500 SOAK_S1_STEPS=200 SOAK_WARM=16
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench_train_loader as btl

LOGS = "/tmp/soak_logs"
S2_STEPS = int(os.environ.get("SOAK_S2_STEPS", 500))
S1_STEPS = int(os.environ.get("SOAK_S1_STEPS", 200))
WARM = int(os.environ.get("SOAK_WARM", 16))  # steps excluded from steps/s
RECORD_EVERY = 20

T0 = time.perf_counter()


def mark(msg):
    print(f"# [{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def ensure_data():
    """Shipped-size synthetic dataset, big enough that the whole soak stays
    inside epoch 0 (no mid-soak epoch-end orbax save distorting steps/s):
    stage 2 needs 500*8+300(valid_head) rows, stage 1 200*20+100."""
    btl.N_ROWS = 4460
    stamp_path = f"{btl.DATA}/gen_stamp.txt"
    stamp = f"N_UNIQUE={btl.N_UNIQUE} N_ROWS={btl.N_ROWS} v2"
    fresh = (os.path.exists(f"{btl.DATA}/manifests/music.tsv")
             and os.path.exists(stamp_path)
             and open(stamp_path).read() == stamp)
    if not fresh:
        btl.gen_data()
        with open(stamp_path, "w") as f:
            f.write(stamp)
    mark(f"data ready ({btl.N_ROWS} rows over {btl.N_UNIQUE} unique mels)")


class SoakMonitor:
    """Injected into cli.train via a dotlist override
    (``lightning.callbacks.soak.target=soak_train.SoakMonitor``) — records
    (step, wall, metrics) at a cadence WITHOUT syncing (device arrays are
    materialized after the run), delivers SIGUSR1 once at ``sig_at``, and
    snapshots the run dir right after the trainer's signal save lands."""

    # class-level channel between the harness and the instance cli.train
    # constructs (instantiate_from_config calls the class with no args)
    sig_at: int = 0
    max_steps: int = 0
    run: dict = {}

    def on_fit_start(self, trainer):
        self.run["trainer"] = trainer

    def on_train_batch_end(self, trainer, batch, metrics, step):
        r = self.run
        now = time.perf_counter()
        if "t_warm" not in r and step >= WARM:
            # sync on ONE scalar so steps/s excludes compile+warmup; a tree
            # block_until_ready would poll ~400 buffers through the tunnel
            float(np.asarray(next(iter(metrics.values()))))
            r["t_warm"], r["warm_step"] = time.perf_counter(), step
        if step % RECORD_EVERY < (step - r.get("prev", 0)) or \
                step >= self.max_steps:
            r.setdefault("records", []).append((step, now, dict(metrics)))
        r["prev"] = step
        if self.sig_at and step >= self.sig_at and "sig_sent" not in r:
            r["sig_sent"] = step
            mark(f"delivering SIGUSR1 at step {step}")
            os.kill(os.getpid(), signal.SIGUSR1)
        elif "sig_sent" in r and "snapshot" not in r:
            # the trainer saved at the batch boundary after the signal;
            # snapshot the WHOLE run dir (configs + checkpoints) so a fresh
            # process can resume from exactly the signal checkpoint
            meta = os.path.join(trainer.ckpt.ckpt_dir, "last_step.json")
            if os.path.exists(meta):
                sig_step = json.load(open(meta))["step"]
                run_dir = os.path.dirname(trainer.ckpt.ckpt_dir)
                snap = run_dir + "_sig_snapshot"
                shutil.rmtree(snap, ignore_errors=True)
                shutil.copytree(run_dir, snap)
                r["snapshot"], r["sig_step"] = snap, sig_step
                mark(f"SIGUSR1 checkpoint at step {sig_step} "
                     f"snapshotted to {snap}")
        if step >= self.max_steps and "t_end" not in r:
            float(np.asarray(next(iter(metrics.values()))))
            r["t_end"], r["end_step"] = time.perf_counter(), step

    def __getattr__(self, name):  # other Callback hooks: no-ops
        if name.startswith("on_"):
            return lambda *a, **k: None
        raise AttributeError(name)


def _finish(r, tag):
    recs = []
    for step, t, metrics in r.pop("records", []):
        scal = {}
        for k, v in metrics.items():
            if np.ndim(v) == 0:
                f = float(np.asarray(v))
                assert np.isfinite(f), f"{tag}: non-finite {k}={f} @ {step}"
                scal[k] = round(f, 5)
        recs.append(dict(step=step, t=round(t - T0, 1), **scal))
    sps = ((r["end_step"] - r["warm_step"])
           / (r["t_end"] - r["t_warm"])) if "t_end" in r else None
    from versband_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()  # already MiB; {} on axon (no runtime
    # memory_stats through the tunnel — see bench_hbm_analysis.py for the
    # static per-program HBM footprint instead)
    out = dict(
        phase=tag, steps=r.get("end_step"), warm_step=r.get("warm_step"),
        sustained_steps_per_sec=round(sps, 2) if sps else None,
        hbm_peak_mib=round(stats["peak_bytes_in_use"])
        if "peak_bytes_in_use" in stats else None,
        hbm_mib=round(stats["bytes_in_use"])
        if "bytes_in_use" in stats else None,
        sig_step=r.get("sig_step"), snapshot=r.get("snapshot"),
        curve=recs)
    return out


def stage2():
    ensure_data()
    from versband_tpu.cli.train import main as train_main

    shutil.rmtree(LOGS, ignore_errors=True)
    SoakMonitor.sig_at = S2_STEPS // 2
    SoakMonitor.max_steps = S2_STEPS
    SoakMonitor.run = {}
    mark(f"stage-2 soak: {S2_STEPS} steps, SIGUSR1 at {SoakMonitor.sig_at}")
    rc = train_main([
        "-b", "configs/vocal2music.yaml", "-t", "--no-test", "-n", "soak_s2",
        "-l", LOGS, "--max_steps", str(S2_STEPS), "--max_epochs", "2",
        "--steps_per_call", "8", "--prefetch_groups", "1", "-s", "0",
        f"data.params.main_spec_dir_path={btl.DATA}/manifests",
        f"data.params.other_condition={btl.DATA}/midi.npy",
        "data.params.num_workers=4",
        "lightning.callbacks.soak.target=soak_train.SoakMonitor",
    ])
    assert rc == 0
    assert SoakMonitor.run, "SoakMonitor never fired (callback wiring broke)"
    out = _finish(SoakMonitor.run, "stage2_cfm")
    assert out["steps"] >= S2_STEPS and out["sig_step"]
    return out


def resume_from_snapshot(snap, sig_step):
    """Cold-restart receipt: a FRESH process resumes the SIGUSR1 checkpoint
    and trains 16 more steps through the same CLI."""
    mark(f"resume receipt: cli.train -r {snap} (+16 steps)")
    proc = subprocess.run(
        [sys.executable, "-m", "versband_tpu.cli.train", "-r", snap, "-t",
         "--no-test", "--max_steps", str(sig_step + 16), "--max_epochs", "2",
         "--steps_per_call", "8", "--prefetch_groups", "1", "-s", "0"],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-3000:])
    assert proc.returncode == 0, "resume run failed"
    assert f"Resumed at step {sig_step}" in proc.stdout, \
        f"expected resume from step {sig_step}"
    meta = json.load(open(os.path.join(snap, "checkpoints",
                                       "last_step.json")))
    assert meta["step"] >= sig_step + 16
    return dict(phase="resume_receipt", resumed_at=sig_step,
                final_step=meta["step"])


def stage1():
    ensure_data()
    from versband_tpu.cli.train import main as train_main

    SoakMonitor.sig_at = 0  # receipt already covered by stage 2
    SoakMonitor.max_steps = S1_STEPS
    SoakMonitor.run = {}
    mark(f"stage-1 VAE-GAN soak: {S1_STEPS} steps (bs 20, crop 624, "
         "disc live from step 1)")
    rc = train_main([
        "-b", "configs/ae_accomp.yaml", "-t", "--no-test", "-n", "soak_s1",
        "-l", LOGS, "--max_steps", str(S1_STEPS), "--max_epochs", "2",
        "-s", "0",
        f"data.params.spec_dir_path={btl.DATA}/manifests",
        "data.params.num_workers=4",
        "model.params.lossconfig.params.disc_start=0",
        "lightning.callbacks.soak.target=soak_train.SoakMonitor",
    ])
    assert rc == 0
    assert SoakMonitor.run, "SoakMonitor never fired (callback wiring broke)"
    out = _finish(SoakMonitor.run, "stage1_vae_gan")
    assert out["steps"] >= S1_STEPS
    return out


def main():
    # Run as `python soak_train.py` this module is `__main__`; alias it so
    # instantiate_from_config("soak_train.SoakMonitor") resolves THIS module
    # (not a fresh second import whose class-level channel is unset).
    sys.modules.setdefault("soak_train", sys.modules[__name__])
    os.environ.setdefault("VERSBAND_LOG_HBM", "1")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    report = []
    if which in ("stage2", "all"):
        out = stage2()
        report.append(out)
        print(json.dumps(out))
        report.append(resume_from_snapshot(out["snapshot"], out["sig_step"]))
        print(json.dumps(report[-1]))
    if which in ("stage1", "all"):
        out = stage1()
        report.append(out)
        print(json.dumps(out))
    os.makedirs(LOGS, exist_ok=True)
    with open(f"{LOGS}/soak_report.json", "w") as f:
        json.dump(report, f, indent=1)
    mark("soak complete")


if __name__ == "__main__":
    main()
