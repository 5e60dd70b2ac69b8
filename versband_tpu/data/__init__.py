from versband_tpu.data.collate import (
    pad_or_cut_xd, collate_1d, collate_2d, collate_1d_or_2d,
    collate_1d_tile, collate_2d_tile, collate_1d_or_2d_tile,
)
from versband_tpu.data.sampler import IndexBatchSampler
from versband_tpu.data.datamodule import DataModule, SpectrogramDataModule, DataLoader
