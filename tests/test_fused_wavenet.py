"""Fused Pallas WaveNet layer (ops/fused_wavenet.py) vs the dense path.

The kernel fuses dilated gate conv + aux 1x1 + tanh*sigmoid + skip/out 1x1s
+ skip accumulation of one ParallelWaveGAN residual layer (reference
``parallel_wavegan/layers/residual_block.py:39-130``). Interpret mode off-TPU
(tests/conftest.py forces the CPU mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.vocoder.pwg import ParallelWaveGANGenerator, ResidualBlock


def _rand_params(key, mod, *args, **kw):
    p = mod.init(key, *args, **kw)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    rng = np.random.default_rng(7)
    leaves = [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))
              * 0.3 for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("dilation", [1, 4, 64, 512])
@pytest.mark.slow
def test_fused_layer_matches_dense(dilation):
    B, T, R, A = 2, 4096, 64, 80
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, R)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, T, A)).astype(np.float32))
    skip0 = jnp.asarray(rng.standard_normal((B, T, 64)).astype(np.float32))

    blk = ResidualBlock(dilation=dilation)
    p = _rand_params(jax.random.PRNGKey(1), blk, x, c)

    out_d, s_d = blk.apply(p, x, c)
    out_f, s_f = blk.apply(p, x, c, skip=skip0)

    ref_skip = skip0 + s_d
    assert out_f.shape == out_d.shape and s_f.shape == ref_skip.shape
    scale = float(jnp.max(jnp.abs(out_d))) + 1e-6
    assert float(jnp.max(jnp.abs(out_f - out_d))) / scale < 1e-5
    sscale = float(jnp.max(jnp.abs(ref_skip))) + 1e-6
    assert float(jnp.max(jnp.abs(s_f - ref_skip))) / sscale < 1e-5


def test_fused_layer_edge_zero_padding():
    """First/last-block taps must see zeros outside [0, t_real)."""
    B, T, R = 1, 4096, 64
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, R)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    skip0 = jnp.zeros((B, T, 64), jnp.float32)

    blk = ResidualBlock(dilation=512)
    p = _rand_params(jax.random.PRNGKey(2), blk, x, c)
    out_d, s_d = blk.apply(p, x, c)
    out_f, s_f = blk.apply(p, x, c, skip=skip0)
    # compare the edges specifically
    for sl in (slice(0, 600), slice(-600, None)):
        assert float(jnp.max(jnp.abs(out_f[:, sl] - out_d[:, sl]))) < 1e-4
        assert float(jnp.max(jnp.abs(s_f[:, sl] - s_d[:, sl]))) < 1e-4


@pytest.mark.parametrize("dilation", [64, 512])
def test_fused_layer_multi_block_seams(dilation):
    """nb>1 grid: dilated taps crossing BLOCK_T(=2048)-row block seams must
    read the neighbor halo blocks, not clamped garbage (serving runs 100+
    blocks; T=8192 here exercises 3 interior seams)."""
    B, T, R, A = 1, 8192, 64, 80
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, T, R)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, T, A)).astype(np.float32))
    skip0 = jnp.asarray(rng.standard_normal((B, T, 64)).astype(np.float32))

    blk = ResidualBlock(dilation=dilation)
    p = _rand_params(jax.random.PRNGKey(6), blk, x, c)
    out_d, s_d = blk.apply(p, x, c)
    out_f, s_f = blk.apply(p, x, c, skip=skip0)

    ref_skip = skip0 + s_d
    scale = float(jnp.max(jnp.abs(out_d))) + 1e-6
    assert float(jnp.max(jnp.abs(out_f - out_d))) / scale < 1e-5
    # the seam region specifically (rows 4096±dilation read across blocks)
    seam = slice(4096 - dilation - 4, 4096 + dilation + 4)
    sscale = float(jnp.max(jnp.abs(ref_skip))) + 1e-6
    assert float(jnp.max(jnp.abs(s_f[:, seam] - ref_skip[:, seam]))) \
        / sscale < 1e-5


@pytest.mark.slow
def test_fused_generator_matches_dense():
    """Whole generator: fused_inference=True == False (same params)."""
    T_MEL, HOP = 16, 320
    B = 1
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((B, 80, T_MEL)).astype(np.float32))
    T = (T_MEL - 4) * HOP
    noise = jnp.asarray(rng.standard_normal((B, 1, T)).astype(np.float32))

    dense = ParallelWaveGANGenerator()
    fused = ParallelWaveGANGenerator(fused_inference=True)
    p = _rand_params(jax.random.PRNGKey(4), dense, noise, mel)

    wav_d = dense.apply(p, noise, mel)
    wav_f = fused.apply(p, noise, mel)
    assert wav_f.shape == wav_d.shape == (B, 1, T)
    scale = float(jnp.max(jnp.abs(wav_d))) + 1e-6
    rel = float(jnp.max(jnp.abs(wav_f - wav_d))) / scale
    assert rel < 5e-5, rel


@pytest.mark.slow
def test_fused_generator_param_tree_identical():
    """fused_inference must not change the checkpoint layout."""
    T_MEL, HOP = 8, 320
    mel = jnp.zeros((1, 80, T_MEL))
    noise = jnp.zeros((1, 1, (T_MEL - 4) * HOP))
    pd = ParallelWaveGANGenerator().init(jax.random.PRNGKey(0), noise, mel)
    pf = ParallelWaveGANGenerator(fused_inference=True).init(
        jax.random.PRNGKey(0), noise, mel)
    sd = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), pd)
    sf = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), pf)
    assert jax.tree_util.tree_structure(sd) == jax.tree_util.tree_structure(sf)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, sd, sf))
