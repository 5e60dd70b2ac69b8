"""Manifest generation CLI — the ``preprocess/preprocess.py`` equivalent.

    python -m versband_tpu.cli.make_manifest \
        --prompts crawl_a.tsv crawl_b.tsv --data_root /data --out music.tsv

Each prompt row carries ``item_name`` (``<sep>``-separated source parts) and a
``caption`` literal list; rows whose accomp/vocal wav pair exists under
``data_root`` produce TWO manifest rows (accomp + vocal) with mel paths and a
``<psep>``-joined caption (``preprocess/preprocess.py:26-81``). The source
path template is configurable since the reference hardcodes its crawl layout.
"""

from __future__ import annotations

import argparse
import ast
import csv
import os

import pandas as pd

from versband_tpu.dsp.audio_io import get_wav_num_frames

MANIFEST_COLUMNS = ["name", "dataset", "audio_path", "mel_path", "duration",
                    "caption"]


def get_parser():
    p = argparse.ArgumentParser("versband_tpu manifest generation")
    p.add_argument("--prompts", nargs="+", required=True,
                   help="crawled prompt TSVs with item_name + caption columns")
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--path_template",
                   default="{root}/{ds}_sp_demix_24k/{sub}/[{idx}]{name}.accomp.wav",
                   help="wav path template with {root},{ds},{sub},{idx},{name}")
    p.add_argument("--sep", default="<sep>")
    return p


def save_df_to_tsv(df: pd.DataFrame, path: str) -> None:
    """Reference TSV conventions: no quoting, backslash escape
    (``preprocess/preprocess.py:13-25``)."""
    df.to_csv(path, sep="\t", header=True, index=False, encoding="utf-8",
              escapechar="\\", quoting=csv.QUOTE_NONE)


def main(argv=None) -> int:
    opt = get_parser().parse_args(argv)
    manifest = {c: [] for c in MANIFEST_COLUMNS}
    skip = 0
    for prompts_tsv in opt.prompts:
        df = pd.read_csv(prompts_tsv, sep="\t")
        for _, item in df.iterrows():
            parts = str(item["item_name"]).split(opt.sep)
            if len(parts) < 4:
                skip += 1
                continue
            ds, sub, name, idx = parts[0], parts[1], parts[2], parts[3]
            wav_path = opt.path_template.format(
                root=opt.data_root, ds=ds, sub=sub, idx=idx, name=name)
            vocal_path = wav_path.replace("accomp", "vocal")
            if not (os.path.exists(wav_path) and os.path.exists(vocal_path)):
                skip += 1
                continue
            try:
                caption = "<psep>".join(ast.literal_eval(item["caption"]))
            except Exception:
                caption = str(item.get("caption", ""))
            dur = get_wav_num_frames(wav_path, 24000) / 24000.0
            for nm, ap in ((item["item_name"], wav_path),
                           (str(item["item_name"]) + "vocal", vocal_path)):
                manifest["name"].append(str(nm))
                manifest["dataset"].append(ds)
                manifest["audio_path"].append(ap)
                manifest["mel_path"].append(
                    os.path.splitext(ap)[0] + "_mel.npy")
                manifest["duration"].append(dur)
                manifest["caption"].append(caption)
    save_df_to_tsv(pd.DataFrame.from_dict(manifest), opt.out)
    print(f"wrote {len(manifest['name'])} rows to {opt.out} (skip {skip})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
