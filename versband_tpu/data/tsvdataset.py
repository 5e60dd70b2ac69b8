"""Single-TSV test dataset — fills the reference's missing
``ldm.data.tsvdataset.TSVDatasetStruct`` module (referenced by
``configs/vocal2music.yaml:104-108`` but absent from the tree, like
``vocal2accomp_dataset`` — SURVEY.md §2.3). Call-site semantics: rows with
mel paths and <ori, struct> caption pairs, cropped to ``spec_crop_len``, for
test-time generation sweeps."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from versband_tpu.data.rng import ThreadLocalRNG


class TSVDataset:
    def __init__(self, tsv_path: str, spec_crop_len: int = 1500,
                 mel_num: int = 80, pad_value: float = -5.0,
                 seed: Optional[int] = None, **kwargs):
        self.df = pd.read_csv(tsv_path, sep="\t")
        self.spec_crop_len = spec_crop_len
        self.mel_num = mel_num
        self.pad_value = pad_value
        self.rng = ThreadLocalRNG(seed)  # loader threads share the dataset

    def _load_mel(self, row) -> np.ndarray:
        try:
            mel = np.load(row["mel_path"]).astype(np.float32)
        except Exception:
            mel = np.full((self.mel_num, self.spec_crop_len), self.pad_value,
                          np.float32)
        if mel.shape[1] > self.spec_crop_len:
            start = int(self.rng.integers(mel.shape[1] - self.spec_crop_len))
            mel = mel[:, start: start + self.spec_crop_len]
        return mel

    def __getitem__(self, idx: int) -> dict:
        row = self.df.iloc[idx]
        return {"image": self._load_mel(row),
                "caption": str(row.get("caption", "")),
                "name": row.get("name", str(idx)),
                "f_name": row.get("name", str(idx))}

    def __len__(self) -> int:
        return len(self.df)


class TSVDatasetStruct(TSVDataset):
    """<ori_caption, struct_caption> pair variant (for the CLAP+T5 embedder)."""

    def __getitem__(self, idx: int) -> dict:
        item = super().__getitem__(idx)
        row = self.df.iloc[idx]
        ori = str(row.get("ori_cap", row.get("caption", "")))
        struct = str(row.get("caption", ""))
        item["caption"] = {"ori_caption": ori, "struct_caption": struct}
        return item
