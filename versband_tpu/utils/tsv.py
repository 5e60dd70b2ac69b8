"""TSV helpers — ``utils/commons/data_utils.py:5-31`` + ``utils/os_utils.py``
equivalents: quote-free TSV IO and small shell-style file ops."""

from __future__ import annotations

import csv
import os
import shutil
import subprocess
from typing import Dict, List

import pandas as pd


def load_samples_from_tsv(path: str) -> List[Dict[str, str]]:
    with open(path, encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t", quotechar=None,
                                doublequote=False, lineterminator="\n",
                                quoting=csv.QUOTE_NONE)
        return [dict(row) for row in reader]


def load_dict_from_tsv(path: str, key: str) -> Dict[str, Dict[str, str]]:
    return {row[key]: row for row in load_samples_from_tsv(path)}


def save_df_to_tsv(df: pd.DataFrame, path: str) -> None:
    df.to_csv(path, sep="\t", header=True, index=False, encoding="utf-8",
              escapechar="\\", quoting=csv.QUOTE_NONE)


def link_file(from_file: str, to_file: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(to_file)), exist_ok=True)
    subprocess.check_call(["ln", "-s", os.path.abspath(from_file), to_file])


def move_file(from_file: str, to_file: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(to_file)), exist_ok=True)
    shutil.move(from_file, to_file)


def copy_file(from_file: str, to_file: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(to_file)), exist_ok=True)
    shutil.copy2(from_file, to_file)


def remove_file(*fns: str) -> None:
    for fn in fns:
        if os.path.islink(fn) or os.path.isfile(fn):
            os.remove(fn)
        elif os.path.isdir(fn):
            shutil.rmtree(fn)
