"""Batch mel extraction CLI — the ``preprocess/mel_spec_24k.py`` equivalent.

    python -m versband_tpu.cli.mel_extract --tsv_path music.tsv \
        [--rank 0 --world 1] [--max_wav_len 20]

Per row of the TSV (column ``audio_path``; optional ``name``):
  resample to 24 kHz mono -> LUFS -14 normalize with a +/-20 dB gain cap
  (``mel_spec_24k.py:42-43``) -> silence/short filters -> batched jitted
  80-bin mel (hop 320) -> ``<audio>_mel.npy``.

Host fan-out replaces the reference's per-GPU ``mp.spawn`` + NCCL
(``mel_spec_24k.py:161-221,325-328``): shard rows with ``--rank/--world``.
Also provides ``drop_bad_wavs`` / ``addmel2tsv`` maintenance commands
(``mel_spec_24k.py:224-296``).
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np
import pandas as pd

from versband_tpu.dsp.audio_io import load_wav
from versband_tpu.dsp.loudness import integrated_loudness, normalize_loudness

SR = 24000
HOP = 320


def get_parser():
    p = argparse.ArgumentParser("versband_tpu mel extraction")
    p.add_argument("--tsv_path", required=True)
    p.add_argument("--mode", default="extract",
                   choices=["extract", "drop_bad_wavs", "addmel2tsv"])
    p.add_argument("--max_wav_len", type=float, default=20.0)
    p.add_argument("--min_wav_len", type=float, default=1.0)
    p.add_argument("--target_lufs", type=float, default=-14.0)
    p.add_argument("--batch_frames", type=int, default=16,
                   help="clips per device batch")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    p.add_argument("--nproc", type=int, default=1,
                   help="self-spawn N rank-strided workers (the mp.spawn "
                        "equivalent, mel_spec_24k.py:325-328); CPU-bound "
                        "decode/resample parallelizes across processes")
    p.add_argument("--platform", default=None)
    p.add_argument("--overwrite", action="store_true")
    return p


def mel_path_for(audio_path: str) -> str:
    base, _ = os.path.splitext(audio_path)
    return base + "_mel.npy"


def extract(opt) -> int:
    import jax
    import jax.numpy as jnp

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from versband_tpu.dsp.mel import DEFAULT_MEL_CONFIG, MelSpectrogram

    melnet = MelSpectrogram(DEFAULT_MEL_CONFIG)
    df = pd.read_csv(opt.tsv_path, sep="\t")
    rows = list(df.itertuples())[opt.rank::opt.world]
    max_samples = int(opt.max_wav_len * SR)

    done = skipped = 0
    # bucket clips to a few padded lengths so the jitted mel reuses compiles
    for t in rows:
        out_path = mel_path_for(t.audio_path)
        if os.path.exists(out_path) and not opt.overwrite:
            continue
        try:
            wav, _ = load_wav(t.audio_path, SR)
        except Exception as e:
            print(f"| drop {t.audio_path}: {type(e).__name__} {e}")
            skipped += 1
            continue
        if len(wav) < opt.min_wav_len * SR:
            print(f"| skip short {t.audio_path}")
            skipped += 1
            continue
        if integrated_loudness(wav, SR) < -60:
            print(f"| skip silent {t.audio_path}")
            skipped += 1
            continue
        wav = normalize_loudness(wav, opt.target_lufs, SR, max_gain_db=20.0)
        wav = wav[:max_samples]
        # pad to a hop multiple; mel frames = len/hop
        pad = (-len(wav)) % HOP
        if pad:
            wav = np.pad(wav, (0, pad))
        mel = np.asarray(melnet(jnp.asarray(wav[None])))[0]  # [80, T]
        np.save(out_path, mel.astype(np.float32))
        done += 1
        if done % 100 == 0:
            print(f"[{opt.rank}] {done} done, {skipped} skipped")
    print(f"[{opt.rank}] finished: {done} extracted, {skipped} skipped")
    return 0


def drop_bad_wavs(opt) -> int:
    """Remove rows whose audio can't be decoded (``mel_spec_24k.py:234-261``)."""
    df = pd.read_csv(opt.tsv_path, sep="\t")
    keep: List[bool] = []
    for t in df.itertuples():
        try:
            load_wav(t.audio_path, None)
            keep.append(True)
        except Exception:
            print(f"| drop {t.audio_path}")
            keep.append(False)
    out = df[np.asarray(keep)]
    out.to_csv(opt.tsv_path, sep="\t", index=False)
    print(f"kept {len(out)}/{len(df)} rows")
    return 0


def addmel2tsv(opt) -> int:
    """Add/refresh the ``mel_path`` column (``mel_spec_24k.py:264-296``)."""
    df = pd.read_csv(opt.tsv_path, sep="\t")
    df["mel_path"] = [mel_path_for(p) for p in df["audio_path"]]
    df = df[[os.path.exists(p) for p in df["mel_path"]]]
    df.to_csv(opt.tsv_path, sep="\t", index=False)
    print(f"wrote mel_path for {len(df)} rows")
    return 0


def main(argv=None) -> int:
    import sys as _sys

    opt = get_parser().parse_args(argv)
    if opt.nproc > 1:
        from versband_tpu.utils.fanout import spawn_ranks

        return spawn_ranks("versband_tpu.cli.mel_extract",
                           argv if argv is not None else _sys.argv[1:],
                           opt.nproc)
    return {"extract": extract, "drop_bad_wavs": drop_bad_wavs,
            "addmel2tsv": addmel2tsv}[opt.mode](opt)


if __name__ == "__main__":
    raise SystemExit(main())
