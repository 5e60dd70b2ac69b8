"""Fan-out plumbing regressions (VERDICT r4 weak #5).

``utils/fanout.py::spawn_ranks`` re-execs a CLI module N times with
``--rank/--world`` appended — the TPU-native replacement for the reference's
``mp.spawn`` (``preprocess/mel_spec_24k.py:325-328``). The unit tests cover
the argv surgery; the slow test drives ``mel_extract --nproc 2`` end to end
over real tiny wavs (subprocess children, CPU platform inherited from the
conftest env).
"""

import os

import numpy as np
import pandas as pd
import pytest

from versband_tpu.utils.fanout import strip_flag

SR = 24000


def test_strip_flag_forms():
    argv = ["--tsv_path", "x.tsv", "--nproc", "4", "--platform", "cpu"]
    assert strip_flag(argv, "--nproc") == ["--tsv_path", "x.tsv",
                                           "--platform", "cpu"]
    assert strip_flag(["--nproc=4", "--mode", "extract"], "--nproc") == \
        ["--mode", "extract"]


@pytest.mark.slow
def test_mel_extract_nproc(tmp_path):
    from scipy.io import wavfile

    from versband_tpu.cli.mel_extract import main as mel_main

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        wav = (rng.standard_normal(int(1.5 * SR)) * 0.1).astype(np.float32)
        p = str(tmp_path / f"clip{i}.wav")
        wavfile.write(p, SR, (wav * 32767).astype(np.int16))
        rows.append(dict(name=f"clip{i}", audio_path=p))
    tsv = str(tmp_path / "music.tsv")
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)

    rc = mel_main(["--tsv_path", tsv, "--nproc", "2", "--platform", "cpu"])
    assert rc == 0
    for i in range(3):
        mel = np.load(tmp_path / f"clip{i}_mel.npy")
        assert mel.shape[0] == 80 and mel.shape[1] > 0
        assert np.isfinite(mel).all()
