"""TSV-manifest loading shared by all datasets.

Mirrors the manifest conventions of ``ldm/data/*``: a directory (or
comma-separated list of directories) of ``*.tsv`` files concatenated into one
table; train/valid head-split; test-name deduplication by ``_<n>`` suffixing
(``joinaudiodataset_624.py:20-50``).
"""

from __future__ import annotations

import glob
from typing import List

import pandas as pd


def load_manifest_dirs(dir_paths: str, recursive: bool = False) -> pd.DataFrame:
    manifest_files: List[str] = []
    for dir_path in str(dir_paths).split(","):
        pattern = f"{dir_path}/**/*.tsv" if recursive else f"{dir_path}/*.tsv"
        manifest_files += glob.glob(pattern, recursive=recursive)
    if not manifest_files:
        raise FileNotFoundError(f"no .tsv manifests under {dir_paths!r}")
    frames = [pd.read_csv(f, sep="\t") for f in sorted(manifest_files)]
    return pd.concat(frames, ignore_index=True)


def split_dataset(df: pd.DataFrame, split: str, valid_head: int) -> pd.DataFrame:
    """train = rows[valid_head:], valid = rows[:valid_head], test = all with
    name dedup."""
    if split == "train":
        out = df.iloc[valid_head:]
    elif split in ("valid", "val"):
        out = df.iloc[:valid_head]
    elif split == "test":
        out = add_name_num(df.copy())
    else:
        raise ValueError(f"Unknown split {split}")
    out = out.reset_index()
    return out


def add_name_num(df: pd.DataFrame) -> pd.DataFrame:
    """Suffix duplicate names with _<n> so every audio-caption pair has a
    unique identifier (``joinaudiodataset_624.py:37-50``)."""
    counts = {}
    names = []
    for name in df["name"]:
        n = counts.get(name, -1) + 1
        counts[name] = n
        names.append(f"{name}_{n}")
    df["name"] = names
    return df
