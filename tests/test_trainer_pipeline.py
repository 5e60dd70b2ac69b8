"""Input-pipeline features of CFMTrainer (round-4 host-gap work).

The reference hides host latency behind 16 DataLoader workers
(``main.py:249-251``); a 1-core TPU host can't, so the trainer overlaps
assembly/h2d with device execution (prefetch thread), optionally compresses
the wire (fp16 mels / int16 ids, widened on device), and collapses duplicate
captions before the frozen tower. These must all be value-preserving:

- pipelined fit == inline fit (same seed -> same params, same step count)
- transfer_dtype='float16' trains to finite losses and _decompress_batch
  restores compute dtypes exactly
- _encode_caption_list(dedupe) returns row-for-row the embeddings of the
  direct encode while encoding fewer tower rows
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.models.cfm import CFM
from versband_tpu.train.step import _decompress_batch
from versband_tpu.train.trainer import CFMTrainer


def _tiny_cfm():
    unet = dict(target="versband_tpu.models.dit.BandMoeDiT",
                params=dict(in_channels=4, context_dim=16, hidden_size=16,
                            depth=1, num_heads=2, max_len=32, num_experts=2,
                            ori_dim=12, multiple_of=8))
    cfm = CFM(unet_config=unet, mel_dim=4, scale_by_std=False)

    from versband_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(embed_dim=4, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=4, kernel_size=5,
        ch=8, ch_mult=[1, 2], num_res_blocks=1, attn_layers=[],
        down_layers=[0], dropout=0.0))
    cfm.first_stage = vae
    vae_params = vae.init({"params": jax.random.PRNGKey(0),
                           "gaussian": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 80, 16)))
    return cfm, vae_params


class _Data:
    """5 deterministic batches of pre-encoded captions."""

    def train_dataloader(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            yield {
                "image": rng.standard_normal((2, 80, 16)).astype(np.float32),
                "caption": {
                    "caption": np.asarray(
                        rng.standard_normal((2, 4, 12)), np.float32),
                    "acoustic": {
                        "midi": rng.integers(0, 128, (2, 1, 16)),
                        "beats": rng.integers(0, 2, (2, 1, 16))},
                },
            }

    def val_dataloader(self):
        raise RuntimeError("no val")


def _fit(tmp_path, tag, **kw):
    cfm, vae_params = _tiny_cfm()
    tr = CFMTrainer(cfm, vae_params, None, learning_rate=1e-3,
                    logdir=str(tmp_path / tag), max_steps=5, max_epochs=1,
                    time_bucket=16, use_tensorboard=False,
                    log_every_n_steps=10 ** 6, seed=0, **kw)
    tr.fit(_Data())
    return tr


@pytest.mark.slow
def test_pipelined_fit_matches_inline(tmp_path):
    """prefetch_groups=1 (default) must be a pure latency optimization: the
    dispatched programs and RNG streams are identical to prefetch_groups=0."""
    tr_in = _fit(tmp_path, "inline", steps_per_call=2, prefetch_groups=0)
    tr_pl = _fit(tmp_path, "pipe", steps_per_call=2, prefetch_groups=2)
    assert tr_in.global_step == tr_pl.global_step == 5
    assert int(tr_pl.state.step) == 5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        tr_in.state.params, tr_pl.state.params)


@pytest.mark.slow
def test_transfer_dtype_fp16_trains(tmp_path):
    """fp16-wire training must run the same program structure to a finite
    loss; values differ from fp32 wire only by the fp16 rounding of inputs."""
    tr = _fit(tmp_path, "fp16", steps_per_call=2, transfer_dtype="float16")
    assert tr.global_step == 5
    assert np.isfinite(float(np.asarray(tr.state.step)))
    lt = jax.tree_util.tree_leaves(tr.state.params)
    assert all(np.isfinite(np.asarray(p)).all() for p in lt)


def test_decompress_batch_widens_exactly():
    b = {
        "image": jnp.asarray(np.float16([[0.5, -2.25]])),
        "midi": jnp.asarray(np.int16([[127, 128]])),
        "caption": jnp.asarray(np.float32([[1.5]])),
        "name": ["a"],  # non-array passthrough
    }
    out = _decompress_batch(b)
    assert out["image"].dtype == jnp.float32
    assert out["midi"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.float32([[0.5, -2.25]]))
    np.testing.assert_array_equal(np.asarray(out["midi"]), [[127, 128]])
    assert out["caption"].dtype == jnp.float32
    assert out["name"] == ["a"]


class _CountingCondStage:
    """Deterministic per-string embedding; counts rows encoded."""

    def __init__(self):
        self.rows = 0

    def __call__(self, cond):
        caps = cond["caption"]
        self.rows += len(caps)
        out = np.stack([np.full((3, 4), float(sum(c.encode()) % 97))
                        for c in caps]).astype(np.float32)
        return {"caption": out}


@pytest.mark.parametrize("n,pattern", [
    (8, ["a", "b", "a", "a", "b", "c", "c", "a"]),  # 3 uniq -> bucket 4
    (4, ["w", "x", "y", "z"]),                       # all distinct: no win
    (1, ["solo"]),
])
def test_caption_dedup_matches_direct_encode(tmp_path, n, pattern):
    cfm, vae_params = _tiny_cfm()
    cs = _CountingCondStage()
    tr = CFMTrainer(cfm, vae_params, cs, learning_rate=1e-3,
                    logdir=str(tmp_path), max_steps=1, max_epochs=1,
                    time_bucket=16, use_tensorboard=False,
                    log_every_n_steps=10 ** 6)
    got = np.asarray(tr._encode_caption_list(list(pattern)))
    direct = cs(dict(caption=list(pattern), acoustic={}))["caption"]
    np.testing.assert_array_equal(got, direct)
    if n == 8:
        # 3 uniques padded to the 4-bucket, +8 for the direct-encode call
        assert cs.rows == 4 + 8


def test_caption_cache_persists_and_skips_tower(tmp_path):
    """The frozen-tower embedding cache (VERDICT r4 item 3): repeat captions
    never touch the tower again — in-RAM within a run, on-disk across
    trainer instances (epochs/restarts) — and values match the direct
    encode exactly."""
    def mk(tag_cs):
        cfm, vae_params = _tiny_cfm()
        return CFMTrainer(cfm, vae_params, tag_cs, learning_rate=1e-3,
                          logdir=str(tmp_path / "run"), max_steps=1,
                          max_epochs=1, time_bucket=16,
                          caption_cache_dir="auto",  # opt-in (see trainer)
                          use_tensorboard=False, log_every_n_steps=10 ** 6)

    cs = _CountingCondStage()
    tr = mk(cs)
    caps = ["a", "b", "a"]
    first = np.asarray(tr._encode_caption_list(caps))
    direct = cs(dict(caption=caps, acoustic={}))["caption"]
    np.testing.assert_array_equal(first, direct)
    rows0 = cs.rows
    second = np.asarray(tr._encode_caption_list(caps))
    assert cs.rows == rows0, "full cache hit must not run the tower"
    np.testing.assert_array_equal(first, second)

    # disk persistence: a fresh trainer on the same logdir starts warm
    import glob as _glob

    assert _glob.glob(str(tmp_path / "run" / "caption_cache" / "*.npy")), \
        "embeddings were not persisted to disk"
    cs2 = _CountingCondStage()
    tr2 = mk(cs2)
    third = np.asarray(tr2._encode_caption_list(caps))
    assert cs2.rows == 0, "disk-cached captions must not re-encode"
    np.testing.assert_array_equal(first, third)

    # the DEFAULT is the plain dedup path: randomized-template datasets
    # never warm a string-keyed cache (docs/BENCH_NOTES.md "Caption cache")
    cfm, vae_params = _tiny_cfm()
    cs3 = _CountingCondStage()
    tr3 = CFMTrainer(cfm, vae_params, cs3, learning_rate=1e-3,
                     logdir=str(tmp_path / "run2"), max_steps=1, max_epochs=1,
                     time_bucket=16, use_tensorboard=False,
                     log_every_n_steps=10 ** 6)
    assert tr3._cap_cache_dir is None
    np.testing.assert_array_equal(
        np.asarray(tr3._encode_caption_list(caps)), first)
