"""Any-length text-to-audio dataset (``ldm/data/joinaudiodataset_anylen.py:
1-135``): main+other manifest pools, caption CFG dropout, pad/tile collate to
multiple-of-4 lengths, duration-sorted ``ordered_indices``."""

from __future__ import annotations

from typing import Optional

import numpy as np

from versband_tpu.data.collate import collate_1d_or_2d, collate_1d_or_2d_tile
from versband_tpu.data.manifests import load_manifest_dirs, split_dataset

from versband_tpu.data.rng import ThreadLocalRNG


class JoinManifestSpecs:
    def __init__(self, split: str, main_spec_dir_path: str,
                 other_spec_dir_path: str = "", mel_num: int = 80,
                 mode: str = "pad", spec_crop_len: int = 1248,
                 pad_value: float = -5.0, drop: float = 0.0,
                 seed: Optional[int] = None, **kwargs):
        assert mode in ("pad", "tile")
        self.split = split
        self.max_batch_len = spec_crop_len
        self.min_batch_len = 64
        self.min_factor = 4
        self.mel_num = mel_num
        self.collate_mode = mode
        self.pad_value = pad_value
        self.drop = drop
        self.rng = ThreadLocalRNG(seed)  # loader threads share the dataset

        self.df_main = load_manifest_dirs(main_spec_dir_path)
        self.df_other = (load_manifest_dirs(other_spec_dir_path).reset_index()
                         if other_spec_dir_path else None)
        self.dataset = split_dataset(self.df_main, split, valid_head=100)

    def ordered_indices(self):
        main = list(self.dataset[["duration"]].sort_values(by="duration").index)
        if self.df_other is None:
            return main
        offset = len(self.dataset)
        other = [i + offset for i in
                 self.df_other[["duration"]].sort_values(by="duration").index]
        return main, other

    def _load_spec(self, data) -> np.ndarray:
        try:
            spec = np.load(data["mel_path"]).astype(np.float32)
        except Exception:
            print(f"corrupted:{data['mel_path']}")
            spec = np.full((self.mel_num, self.min_batch_len), self.pad_value,
                           np.float32)
        if spec.shape[1] > self.max_batch_len:
            start = int(self.rng.integers(spec.shape[1] - self.max_batch_len))
            spec = spec[:, start: start + self.max_batch_len]
        return spec

    def __getitem__(self, idx: int) -> dict:
        if self.df_other is not None and idx >= len(self.dataset):
            data = self.df_other.iloc[idx - len(self.dataset)]
        else:
            data = self.dataset.iloc[idx % len(self.dataset)]
        caption = ""
        if self.rng.uniform() > self.drop:
            caption = str(data.get("caption", ""))
        item = {"image": self._load_spec(data), "caption": caption,
                "name": data.get("name")}
        if self.split == "test":
            item["f_name"] = data.get("name")
        return item

    def collater(self, inputs) -> dict:
        cols = {k: [i[k] for i in inputs] for k in inputs[0]}
        kw = dict(min_len=self.min_batch_len, max_len=self.max_batch_len,
                  min_factor=self.min_factor)
        if self.collate_mode == "pad":
            image = collate_1d_or_2d(cols["image"], self.pad_value, **kw)
        else:
            image = collate_1d_or_2d_tile(cols["image"], **kw)
        return {"image": image, "caption": cols["caption"],
                "name": cols.get("name")}

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.df_other is not None:
            n += len(self.df_other)
        return n


class JoinSpecsTrain(JoinManifestSpecs):
    def __init__(self, specs_dataset_cfg):
        super().__init__("train", **specs_dataset_cfg)


class JoinSpecsValidation(JoinManifestSpecs):
    def __init__(self, specs_dataset_cfg):
        super().__init__("valid", **specs_dataset_cfg)


class JoinSpecsTest(JoinManifestSpecs):
    def __init__(self, specs_dataset_cfg):
        super().__init__("test", **specs_dataset_cfg)


class StructJoinManifestSpecs(JoinManifestSpecs):
    """Dual-caption variant (``joinaudiodataset_struct_sample_anylen.py:
    20-118``): main items carry <ori_caption, struct_caption> pairs; 'other'
    pool items synthesize ``<caption& all>`` struct captions."""

    def __getitem__(self, idx: int) -> dict:
        from_other = self.df_other is not None and idx >= len(self.dataset)
        data = (self.df_other.iloc[idx - len(self.dataset)] if from_other
                else self.dataset.iloc[idx % len(self.dataset)])
        if self.rng.uniform() > self.drop:
            if from_other:
                ori = str(data.get("caption", ""))
                struct = f"<{ori}& all>"
            else:
                ori = str(data.get("ori_cap", ""))
                struct = str(data.get("caption", ""))
        else:
            ori = struct = ""
        return {"image": self._load_spec(data),
                "caption": {"ori_caption": ori, "struct_caption": struct},
                "name": data.get("name")}

    def collater(self, inputs) -> dict:
        out = super().collater(
            [{**i, "caption": ""} for i in inputs])
        out["caption"] = {
            "ori_caption": [i["caption"]["ori_caption"] for i in inputs],
            "struct_caption": [i["caption"]["struct_caption"] for i in inputs],
        }
        return out
