"""Gradient accumulation (optax.MultiSteps) + eval-mode validation semantics.

The reference's ``--accumulate_grad_batches`` (Lightning, ``main.py:823-831``)
means: k micro-batches accumulate into ONE optimizer step whose gradient is
the mean over micro-batches; EMA and schedules tick per optimizer step.
Validation runs the module in eval mode (``ddpm.py:357-364``): hard MoE
routing, no Gumbel noise — deterministic given (params, batch, t, noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versband_tpu.train.state import TrainState, make_adamw


def _quadratic_grads(params, xs):
    # grad of 0.5 * ||p - x||^2 wrt p is (p - x)
    return [jax.tree_util.tree_map(lambda p: p - x, params) for x in xs]


def test_multisteps_k_micro_equals_one_full_batch_step():
    params = {"w": jnp.ones((3,)) * 2.0}
    xs = [0.5, 1.5, 2.5, 3.5]

    # k=4 accumulation: four micro-steps with per-micro-batch grads
    tx_acc = make_adamw(1e-2, accumulate_grad_batches=4)
    st = TrainState.create(params, tx_acc)
    for g in _quadratic_grads(params, xs):
        st = st.apply_gradients(g)

    # single full-batch step with the mean gradient
    tx_full = make_adamw(1e-2)
    st_full = TrainState.create(params, tx_full)
    mean_grad = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *_quadratic_grads(params, xs))
    st_full = st_full.apply_gradients(mean_grad)

    np.testing.assert_allclose(np.asarray(st.params["w"]),
                               np.asarray(st_full.params["w"]), atol=1e-6)


def test_multisteps_params_frozen_between_applies():
    params = {"w": jnp.zeros((2,))}
    tx = make_adamw(1e-2, accumulate_grad_batches=3)
    st = TrainState.create(params, tx)
    g = {"w": jnp.ones((2,))}
    st1 = st.apply_gradients(g)
    st2 = st1.apply_gradients(g)
    # no update applied until the 3rd micro-step
    assert np.allclose(np.asarray(st1.params["w"]), 0.0)
    assert np.allclose(np.asarray(st2.params["w"]), 0.0)
    st3 = st2.apply_gradients(g)
    assert not np.allclose(np.asarray(st3.params["w"]), 0.0)


def test_ema_ticks_per_optimizer_step_under_accumulation():
    params = {"w": jnp.zeros((2,))}
    tx = make_adamw(1e-1, accumulate_grad_batches=2)
    st = TrainState.create(params, tx, ema_decay=0.9999)
    g = {"w": jnp.ones((2,))}
    st = st.apply_gradients(g)   # micro-step 1: no apply, no EMA tick
    assert int(st.ema.num_updates) == 0
    st = st.apply_gradients(g)   # micro-step 2: apply + EMA tick
    assert int(st.ema.num_updates) == 1
    # warm-up decay (1+1)/(10+1) pulls the shadow toward the new params
    assert not np.allclose(np.asarray(st.ema.shadow["w"]), 0.0)


def test_train_step_anneal_step_is_optimizer_step():
    """make_cfm_train_step passes step // k to the MoE annealing schedules."""
    import inspect

    from versband_tpu.train.step import make_cfm_train_step

    src = inspect.getsource(make_cfm_train_step)
    assert "state.step // accum" in src


@pytest.fixture(scope="module")
def tiny_cfm():
    from versband_tpu.models.cfm import CFM

    unet = dict(target="versband_tpu.models.dit.BandMoeDiT",
                params=dict(in_channels=4, context_dim=16, hidden_size=32,
                            depth=1, num_heads=2, max_len=32, num_experts=4,
                            ori_dim=12, multiple_of=8))
    cfm = CFM(unet_config=unet, mel_dim=4, mel_length=16,
              scale_by_std=False, scale_factor=1.0)
    B, C, T = 2, 4, 16
    x = jnp.zeros((B, C, T))
    t = jnp.zeros((B,), jnp.int32)
    cond = {"caption": jax.random.normal(jax.random.PRNGKey(0), (B, 6, 12)),
            "acoustic": {"midi": jnp.zeros((B, 1, 2 * T), jnp.int32),
                         "beats": jnp.zeros((B, 1, 2 * T), jnp.int32)}}
    from versband_tpu.models.cfm import _cond_to_context

    params = cfm.model.init(
        {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)},
        x, t, _cond_to_context(cond), train=True)
    x_start = jax.random.normal(jax.random.PRNGKey(3), (B, C, T))
    return cfm, params, x_start, cond


@pytest.mark.slow
def test_eval_mode_loss_is_deterministic(tiny_cfm):
    """p_losses with train=False: no Gumbel noise — identical (t, noise) give
    identical losses across calls and across gumbel keys."""
    cfm, params, x_start, cond = tiny_cfm
    from versband_tpu.models.cfm import cfm_p_losses

    t = jnp.array([100, 700])
    noise = jax.random.normal(jax.random.PRNGKey(9), x_start.shape)
    l1, _ = cfm_p_losses(cfm.model.apply, params, x_start, cond, t, noise,
                         gumbel_rng=None)
    l2, _ = cfm_p_losses(cfm.model.apply, params, x_start, cond, t, noise,
                         gumbel_rng=None)
    assert float(l1) == float(l2)

    # training mode with different gumbel keys must differ (soft noisy routing)
    l3, _ = cfm_p_losses(cfm.model.apply, params, x_start, cond, t, noise,
                         gumbel_rng=jax.random.PRNGKey(4))
    l4, _ = cfm_p_losses(cfm.model.apply, params, x_start, cond, t, noise,
                         gumbel_rng=jax.random.PRNGKey(5))
    assert float(l3) != float(l4)
