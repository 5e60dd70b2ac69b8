"""ProcessDataLoader: spawn-worker batch loading (the reference's
``DataLoader(num_workers=16)`` analogue, ``main.py:249-251``) — stream-order
determinism, DataModule wiring, and worker-failure propagation."""

import os

import numpy as np
import pandas as pd
import pytest

from versband_tpu.data.proc_loader import ProcessDataLoader
from versband_tpu.data.sampler import IndexBatchSampler
from versband_tpu.utils.config import instantiate_from_config


@pytest.fixture()
def fixed_tree(tmp_path):
    """8 mels, all exactly (80, 64): fixed_len at crop 64 neither tiles nor
    crops, so item content is deterministic across loader implementations."""
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rng = np.random.default_rng(7)
    rows = []
    for i in range(8):
        name = f"song{i}"
        mp = mel_dir / f"{name}_mel.npy"
        np.save(mp, rng.standard_normal((80, 64)).astype(np.float32))
        rows.append(dict(name=name, dataset="test", mel_path=str(mp),
                         duration=64 / 75.0))
    man_dir = tmp_path / "manifests"
    man_dir.mkdir()
    pd.DataFrame(rows).to_csv(man_dir / "music.tsv", sep="\t", index=False)
    return tmp_path


def _fixed_cfg(tree):
    return {"target": "versband_tpu.data.fixed_len.JoinManifestSpecs",
            "params": {"split": "test",
                       "spec_dir_path": str(tree / "manifests"),
                       "mel_num": 80, "spec_crop_len": 64, "seed": 0}}


@pytest.mark.slow
def test_proc_loader_matches_sequential_order(fixed_tree):
    cfg = _fixed_cfg(fixed_tree)
    ds = instantiate_from_config(cfg)
    sampler = IndexBatchSampler(list(range(len(ds))), 3, num_replicas=1,
                                rank=0, shuffle=False)
    want = [ds.collater([ds[i] for i in idxs]) for idxs in sampler]

    loader = ProcessDataLoader(cfg, sampler, num_procs=2, seed=0)
    try:
        got = list(loader)
        assert len(got) == len(want) == len(loader)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g["image"], w["image"])
            assert g["f_name"] == w["f_name"]
        # pool persists across epochs: a second pass reuses the same workers
        pids = [p.pid for p in loader._procs]
        got2 = list(loader)
        assert [p.pid for p in loader._procs] == pids
        np.testing.assert_array_equal(got2[0]["image"], want[0]["image"])
    finally:
        loader.close()
    assert loader._procs is None  # close() is idempotent + actually ran
    loader.close()


def test_datamodule_num_worker_procs(fixed_tree):
    from versband_tpu.data.datamodule import DataModule

    dm = DataModule(batch_size=4, test=_fixed_cfg(fixed_tree),
                    num_worker_procs=2, num_replicas=1, rank=0)
    loader = dm.test_dataloader()
    assert isinstance(loader, ProcessDataLoader)
    try:
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (4, 80, 64)
        # order deterministic: names follow the unshuffled sampler order
        # (test split unique-suffixes names with their occurrence index)
        assert batches[0]["f_name"] == [f"song{i}_0" for i in range(4)]
    finally:
        loader.close()


@pytest.mark.slow
def test_cli_train_with_proc_loader(fixed_tree, tmp_path):
    """The operator path: 2 stage-1 steps with data.params.num_worker_procs=2
    (the reference's DataLoader(num_workers=N) analogue, main.py:249-251)."""
    import glob

    from versband_tpu.cli.train import main as train_main

    # fixed_len's valid_head=100 needs >100 rows for a non-empty train split
    man = fixed_tree / "manifests" / "music.tsv"
    df = pd.read_csv(man, sep="\t")
    big = pd.concat([df.assign(name=df["name"] + f"_r{k}") for k in range(16)])
    big.to_csv(man, sep="\t", index=False)

    rc = train_main([
        "-b", "configs/ae_accomp.yaml", "-t", "-n", "procs",
        "-l", str(tmp_path), "--devices", "1", "--max_steps", "2",
        "--max_epochs", "1", "-s", "7",
        f"data.params.spec_dir_path={fixed_tree}/manifests",
        "data.params.batch_size=4", "data.params.num_worker_procs=2",
        "data.params.spec_len=64", "data.params.spec_crop_len=64",
        "model.params.lossconfig.params.disc_start=0",
        "model.params.embed_dim=4",
        "model.params.ddconfig.z_channels=4",
        "model.params.ddconfig.ch=8",
        "model.params.ddconfig.ch_mult=[1, 2]",
        "model.params.ddconfig.num_res_blocks=1",
        "model.params.ddconfig.attn_layers=[]",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(f"{tmp_path}/*_procs")
    assert os.path.exists(os.path.join(run_dir, "checkpoints",
                                       "last_step.json"))


def test_proc_loader_worker_failure_propagates(fixed_tree):
    bad = {"target": "versband_tpu.data.fixed_len.NoSuchDataset", "params": {}}
    sampler = IndexBatchSampler(list(range(4)), 2, num_replicas=1, rank=0,
                                shuffle=False)
    loader = ProcessDataLoader(bad, sampler, num_procs=1, seed=0,
                               result_timeout=60)
    with pytest.raises(RuntimeError):
        list(loader)
    assert loader._procs is None  # pool torn down on failure


def test_proc_loader_abandoned_iteration_no_stale_batches(fixed_tree):
    """A consumer that breaks mid-epoch (trainer max_steps) leaves in-flight
    results in out_q; the next epoch must not deliver them as its own."""
    cfg = _fixed_cfg(fixed_tree)
    ds = instantiate_from_config(cfg)
    sampler = IndexBatchSampler(list(range(len(ds))), 2, num_replicas=1,
                                rank=0, shuffle=False)
    want = [ds.collater([ds[i] for i in idxs]) for idxs in sampler]

    loader = ProcessDataLoader(cfg, sampler, num_procs=2, seed=0,
                               prefetch=4)
    try:
        it = iter(loader)
        next(it)  # consume one batch, abandon with 3 jobs still in flight
        del it
        import time

        time.sleep(1.0)  # let stale results land in out_q
        got = list(loader)  # fresh epoch must re-deliver 0..N in order
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g["image"], w["image"])
            assert g["f_name"] == w["f_name"]
    finally:
        loader.close()
