"""Pipelined generator ordering/depth + EMA scope helper."""

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.sample.pipeline import PipelinedGenerator
from versband_tpu.train.state import TrainState, EmaState, ema_scope, make_adamw


def test_pipeline_preserves_order_and_results():
    sample = jax.jit(lambda cond, key: cond * 2.0)
    decode = jax.jit(lambda z: z + 1.0)
    vocode = jax.jit(lambda mel: mel.sum(axis=-1))

    gen = PipelinedGenerator(sample, decode, vocode, depth=3)
    reqs = [(jnp.full((2, 4), float(i)), jax.random.PRNGKey(i))
            for i in range(7)]
    outs = list(gen.generate(iter(reqs)))
    assert len(outs) == 7
    for i, out in enumerate(outs):
        np.testing.assert_allclose(out, (i * 2.0 + 1.0) * 4, atol=1e-6)


def test_pipeline_without_vocoder():
    gen = PipelinedGenerator(jax.jit(lambda c, k: c), jax.jit(lambda z: z * 3),
                             None, depth=1)
    outs = list(gen.generate([(jnp.ones(3), None)]))
    np.testing.assert_allclose(outs[0], 3.0)


def test_ema_scope():
    params = {"w": jnp.zeros(4)}
    st = TrainState.create(params, make_adamw(1e-2), ema_decay=0.5)
    # move params; ema shadow lags
    st = st.replace(params={"w": jnp.ones(4)})
    st = st.replace(ema=st.ema.update(st.params))
    with ema_scope(st) as eval_params:
        assert 0.0 < float(eval_params["w"][0]) < 1.0  # shadow, not params
    st2 = TrainState.create(params, make_adamw(1e-2))  # no ema
    with ema_scope(st2) as eval_params:
        assert eval_params is st2.params
