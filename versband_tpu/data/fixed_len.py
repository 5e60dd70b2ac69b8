"""Fixed-length VAE dataset (``ldm/data/joinaudiodataset_624.py:11-99``):
mel crops tiled to >= ``spec_crop_len`` then randomly cropped to exactly that
length. Caption unused (the VAE is unconditional)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from versband_tpu.data.manifests import load_manifest_dirs, split_dataset

from versband_tpu.data.rng import ThreadLocalRNG


class JoinManifestSpecs:
    def __init__(self, split: str, spec_dir_path: str, mel_num: int = 80,
                 spec_crop_len: int = 624, drop: float = 0.0,
                 seed: Optional[int] = None, **kwargs):
        self.split = split
        self.batch_max_length = spec_crop_len
        self.batch_min_length = 50
        self.mel_num = mel_num
        self.drop = drop
        self.rng = ThreadLocalRNG(seed)  # loader threads share the dataset
        df = load_manifest_dirs(spec_dir_path, recursive=True)
        self.dataset = split_dataset(df, split, valid_head=100)

    def __getitem__(self, idx: int) -> dict:
        data = self.dataset.iloc[idx]
        try:
            spec = np.load(data["mel_path"])
        except Exception:
            print(f"corrupted:{data['mel_path']}")
            spec = np.zeros((self.mel_num, self.batch_max_length), np.float32)

        if spec.shape[1] < self.batch_max_length:
            reps = self.batch_max_length // spec.shape[1] + 1
            spec = np.tile(spec, reps)
        if spec.shape[1] > self.batch_max_length:
            start = int(self.rng.integers(spec.shape[1] - self.batch_max_length))
            spec = spec[:, start: start + self.batch_max_length]

        item = {"image": spec[:, : self.batch_max_length].astype(np.float32)}
        if self.split == "test":
            item["f_name"] = data["name"]
        return item

    def collater(self, inputs):
        out = {"image": np.stack([i["image"] for i in inputs])}
        if "f_name" in inputs[0]:
            out["f_name"] = [i["f_name"] for i in inputs]
        return out

    def load_batch(self, idxs):
        """Batched fast path: mel crops via the native C++ loader (GIL-free
        mmap + thread pool); items shorter than the crop fall back to the
        per-item tile path."""
        from versband_tpu import native

        rows = [self.dataset.iloc[i] for i in idxs]
        paths = [r["mel_path"] for r in rows]
        starts = [0] * len(rows)
        batch, lengths = native.load_mel_batch(
            paths, self.mel_num, self.batch_max_length)
        # random crop for long items: re-read with an offset (cheap, mmap'd)
        long_idx = [i for i, r in enumerate(rows)
                    if lengths[i] > 0]
        redo = []
        for i in long_idx:
            full_len = np.load(paths[i], mmap_mode="r").shape[1]
            if full_len > self.batch_max_length:
                starts[i] = int(self.rng.integers(
                    full_len - self.batch_max_length))
                redo.append(i)
        if redo:
            sub, _ = native.load_mel_batch(
                [paths[i] for i in redo], self.mel_num,
                self.batch_max_length, starts=[starts[i] for i in redo])
            for j, i in enumerate(redo):
                batch[i] = sub[j]
        # short/corrupted items: per-item semantics (tile / zero fallback)
        for i, r in enumerate(rows):
            if lengths[i] < self.batch_max_length:
                batch[i] = self[int(idxs[i])]["image"]
        out = {"image": batch}
        if self.split == "test":
            out["f_name"] = [r["name"] for r in rows]
        return out

    def __len__(self) -> int:
        return len(self.dataset)


class JoinSpecsTrain(JoinManifestSpecs):
    def __init__(self, specs_dataset_cfg):
        super().__init__("train", **specs_dataset_cfg)


class JoinSpecsValidation(JoinManifestSpecs):
    def __init__(self, specs_dataset_cfg):
        super().__init__("valid", **specs_dataset_cfg)


class JoinSpecsTest(JoinManifestSpecs):
    def __init__(self, specs_dataset_cfg):
        super().__init__("test", **specs_dataset_cfg)
