"""Native C++ batch loader: builds, matches numpy semantics, handles bad files,
and beats/matches per-file np.load on a batch."""

import os
import time

import numpy as np
import pytest

from versband_tpu import native


@pytest.fixture(scope="module")
def mel_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mels")
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i in range(16):
        arr = rng.randn(80, 40 + 7 * i).astype(np.float32)
        p = str(d / f"m{i}.npy")
        np.save(p, arr)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_build():
    assert native.ensure_built(), "g++ build of the native loader failed"


def test_matches_numpy_semantics(mel_files):
    paths, arrays = mel_files
    batch, lengths = native.load_mel_batch(paths, 80, 96, pad_value=-5.0)
    ref, ref_len = native._numpy_fallback(paths, None, 80, 96, -5.0)
    np.testing.assert_array_equal(batch, ref)
    np.testing.assert_array_equal(lengths, ref_len)
    # padding value in the tail
    assert (batch[0, :, lengths[0]:] == -5.0).all()
    # content matches the source
    np.testing.assert_array_equal(batch[3, :, :lengths[3]],
                                  arrays[3][:, :96][:, :lengths[3]])


def test_crop_starts(mel_files):
    paths, arrays = mel_files
    starts = [5] * len(paths)
    batch, lengths = native.load_mel_batch(paths, 80, 16, starts=starts)
    np.testing.assert_array_equal(batch[2, :, :16], arrays[2][:, 5:21])


def test_bad_file_marked(tmp_path, mel_files):
    paths, _ = mel_files
    bad = str(tmp_path / "bad.npy")
    with open(bad, "w") as f:
        f.write("not an npy")
    batch, lengths = native.load_mel_batch([paths[0], bad, paths[1]], 80, 32)
    assert lengths[1] == -1
    assert (batch[1] == -5.0).all()
    assert lengths[0] > 0 and lengths[2] > 0


def test_speed_vs_python(mel_files):
    paths, _ = mel_files
    paths = paths * 8  # 128 loads
    t0 = time.perf_counter()
    native.load_mel_batch(paths, 80, 128, num_threads=8)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    native._numpy_fallback(paths, None, 80, 128, -5.0)
    t_numpy = time.perf_counter() - t0
    print(f"native {t_native*1e3:.2f} ms vs numpy {t_numpy*1e3:.2f} ms")
    assert t_native < t_numpy * 3  # at minimum not pathologically slower
