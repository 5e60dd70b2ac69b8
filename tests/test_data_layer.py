"""Data layer tests: collate semantics, pad_or_cut_xd, bucketed sampler
rank-striding, and the vocal2accomp dataset over a synthetic manifest tree."""

import os

import numpy as np
import pandas as pd
import pytest

from versband_tpu.data.collate import (
    pad_or_cut_xd, collate_1d, collate_2d, collate_2d_tile)
from versband_tpu.data.sampler import IndexBatchSampler
from versband_tpu.data.datamodule import DataLoader, SpectrogramDataModule


def test_pad_or_cut_xd():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    padded = pad_or_cut_xd(x, 6, dim=1, pad_value=-5)
    assert padded.shape == (3, 6)
    assert (padded[:, 4:] == -5).all()
    cut = pad_or_cut_xd(x, 2, dim=1)
    np.testing.assert_array_equal(cut, x[:, :2])
    same = pad_or_cut_xd(x, 4, dim=1)
    np.testing.assert_array_equal(same, x)


def test_collate_2d_pad_and_factor():
    vals = [np.ones((80, 10)), np.ones((80, 13))]
    out = collate_2d(vals, pad_idx=-5, min_factor=4)
    # 13 -> rounded up to 16
    assert out.shape == (2, 80, 16)
    assert (out[0, :, 10:] == -5).all()
    assert (out[1, :, 13:] == -5).all()
    # min/max len clamps
    out = collate_2d(vals, pad_idx=0, min_len=32, min_factor=4)
    assert out.shape[2] == 32
    out = collate_2d(vals, pad_idx=0, max_len=8, min_factor=4)
    assert out.shape[2] == 8


def test_collate_1d_shift_right():
    vals = [np.array([1.0, 2, 3]), np.array([4.0, 5])]
    out = collate_1d(vals, pad_idx=0, shift_right=True, shift_id=9)
    assert out[0, 0] == 9 and out[0, 1] == 1
    assert out.shape == (2, 3)


def test_collate_tile():
    vals = [np.ones((4, 3)) * 7, np.ones((4, 8))]
    out = collate_2d_tile(vals, min_factor=4)
    assert out.shape == (2, 4, 8)
    assert (out[0] == 7).all()  # tiled, not padded


def test_sampler_rank_striding():
    idx = list(range(20))
    s0 = IndexBatchSampler(idx, 2, num_replicas=2, rank=0, shuffle=False)
    s1 = IndexBatchSampler(idx, 2, num_replicas=2, rank=1, shuffle=False)
    b0, b1 = list(s0), list(s1)
    assert len(b0) == len(b1) == 5
    flat = sorted(i for b in b0 + b1 for i in b)
    assert flat == idx
    assert not (set(map(tuple, b0)) & set(map(tuple, b1)))


def test_sampler_exact_batch_per_replica():
    # len(batches) == num_replicas must still rank-stride (each rank gets its
    # own disjoint batch), not collapse every rank onto batches[0].
    idx = list(range(8))
    parts = [list(IndexBatchSampler(idx, 2, num_replicas=4, rank=r,
                                    shuffle=False)) for r in range(4)]
    assert all(len(p) == 1 for p in parts)
    flat = sorted(i for p in parts for b in p for i in b)
    assert flat == idx


def test_sampler_fewer_batches_than_replicas_and_empty():
    # 1 batch, 4 replicas: every rank sees exactly one batch (wrap-around) so
    # collectives stay in lockstep.
    parts = [list(IndexBatchSampler([0, 1], 2, num_replicas=4, rank=r,
                                    shuffle=False)) for r in range(4)]
    assert all(p == [[0, 1]] for p in parts)
    # Empty index list must yield zero batches, not IndexError.
    assert list(IndexBatchSampler([], 2, num_replicas=4, rank=0)) == []
    # drop_last trimming to zero batches is also safe.
    assert list(IndexBatchSampler([0, 1, 2], 2, num_replicas=4, rank=1,
                                  drop_last=True)) == []


def test_sampler_epoch_shuffle_deterministic():
    idx = list(range(16))
    a = IndexBatchSampler(idx, 4, num_replicas=1, rank=0, shuffle=True, seed=3)
    b = IndexBatchSampler(idx, 4, num_replicas=1, rank=0, shuffle=True, seed=3)
    a.set_epoch(1); b.set_epoch(1)
    assert list(a) == list(b)
    before = list(a)
    a.set_epoch(2)
    assert list(a) != before  # epoch changes the order


def test_sampler_max_tokens_cap():
    lengths = [100] * 10
    s = IndexBatchSampler(list(range(10)), 8, num_replicas=1, rank=0,
                          shuffle=False, max_tokens=350, lengths=lengths)
    for batch in s:
        assert len(batch) * 100 <= 400  # 3-item batches under the cap


@pytest.fixture()
def manifest_tree(tmp_path):
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    midi_d, beats_d = {}, {}
    for i in range(8):
        T = int(rng.integers(40, 90))
        name = f"song{i}"
        mel = rng.standard_normal((80, T)).astype(np.float32)
        vocal = rng.standard_normal((80, T)).astype(np.float32)
        mp = mel_dir / f"{name}_mel.npy"
        vp = mel_dir / f"{name}_vocal_mel.npy"
        np.save(mp, mel)
        np.save(vp, vocal)
        midi_d[name] = rng.integers(0, 128, T).astype(np.int64)
        beats_d[name] = rng.integers(0, 2, T).astype(np.int64)
        rows.append(dict(name=name, dataset="test", mel_path=str(mp),
                         vocal_mel_path=str(vp), duration=T / 75.0,
                         caption="piano<psep>soft piano",
                         key="C major", key_confidence=0.9, avg_pitch=66.0,
                         tempo=100.0, tempo_confidence=0.9,
                         emotion="['calm']", wav_len=T / 75.0))
    man_dir = tmp_path / "manifests"
    man_dir.mkdir()
    pd.DataFrame(rows).to_csv(man_dir / "music.tsv", sep="\t", index=False)
    np.save(tmp_path / "midi.npy", midi_d, allow_pickle=True)
    np.save(tmp_path / "beats.npy", beats_d, allow_pickle=True)
    return tmp_path


def test_vocal2accomp_dataset_and_loader(manifest_tree):
    from versband_tpu.data.vocal2accomp import JoinManifestSpecs

    ds = JoinManifestSpecs(
        "train", str(manifest_tree / "manifests"),
        spec_crop_len=96, other_condition=str(manifest_tree / "midi.npy"),
        drop=0.1, seed=0)
    # valid_head=300 > 8 rows -> train gets nothing; use test split instead
    ds = JoinManifestSpecs(
        "test", str(manifest_tree / "manifests"),
        spec_crop_len=96, other_condition=str(manifest_tree / "midi.npy"),
        drop=0.1, seed=0)
    assert len(ds) == 8
    item = ds[0]
    assert item["image"].shape[0] == 80
    assert item["acoustic"].shape[0] == 20
    assert item["image"].shape[1] % 8 == 0
    assert item["image"].shape[1] == item["midi"].shape[1]

    sampler = IndexBatchSampler(ds.ordered_indices(), 4, num_replicas=1,
                                rank=0, shuffle=False)
    loader = DataLoader(ds, sampler, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape[0] == 4
    assert b["image"].shape[2] % 4 == 0
    cond = b["caption"]
    assert set(cond) == {"caption", "acoustic", "name"}
    assert cond["acoustic"]["midi"].dtype == np.int32
    assert cond["acoustic"]["acoustic"].shape[1] == 20
    # names unique-suffixed in test split
    assert all(n.endswith("_0") for n in cond["name"])


def test_fixed_len_dataset(manifest_tree):
    from versband_tpu.data.fixed_len import JoinManifestSpecs

    ds = JoinManifestSpecs("test", str(manifest_tree / "manifests"),
                           mel_num=80, spec_crop_len=64, seed=1)
    item = ds[0]
    assert item["image"].shape == (80, 64)
    batch = ds.collater([ds[i] for i in range(3)])
    assert batch["image"].shape == (3, 80, 64)


def test_datamodule_from_config(manifest_tree):
    dm = SpectrogramDataModule(
        batch_size=2, num_workers=2,
        main_spec_dir_path=str(manifest_tree / "manifests"),
        spec_crop_len=96, mode="pad",
        other_condition=str(manifest_tree / "midi.npy"),
        test={"target": "versband_tpu.data.vocal2accomp.JoinSpecsTest"},
        num_replicas=1, rank=0)
    loader = dm.test_dataloader()
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 2


def test_sampler_equal_rank_counts_without_drop_last():
    """Non-divisible batch counts must wrap around so every rank sees the
    same number of batches (unequal counts hang multihost collectives)."""
    from versband_tpu.data.sampler import IndexBatchSampler

    # 10 batches over 4 replicas -> pad to 12, 3 per rank
    counts, seen = [], []
    for rank in range(4):
        s = IndexBatchSampler(range(40), batch_size=4, num_replicas=4,
                              rank=rank, shuffle=False)
        counts.append(len(s.batches))
        seen.extend(tuple(b) for b in s.batches)
    assert counts == [3, 3, 3, 3]
    # every original batch still covered at least once
    every = {tuple(range(i, i + 4)) for i in range(0, 40, 4)}
    assert set(seen) >= every

    # drop_last still truncates instead of padding
    s = IndexBatchSampler(range(40), batch_size=4, num_replicas=4, rank=0,
                          shuffle=False, drop_last=True)
    assert len(s.batches) == 2
