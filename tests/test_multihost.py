"""Two-process multi-host validation on CPU.

Spawns 2 real JAX processes wired through ``jax.distributed.initialize``
(2 virtual CPU devices each -> 4 global devices) and asserts:
  * the per-host ``IndexBatchSampler`` shards batches DISJOINTLY and covers
    every batch exactly once across processes (the DDP semantics of
    ``joinaudiodataset_anylen.py:171-174``);
  * a jitted global-mesh psum sees all 4 devices;
  * a DP data-parallel train step over the 2-process global mesh produces
    the same updated params as a single-process full-batch step (gradient
    all-reduce across hosts is correct).

This de-risks the only SURVEY §2.10 row without executable evidence
(multi-process DP); everything else in the suite is single-process.
"""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.multihost]

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2,
                           process_id={pid})
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

out = {{"process_index": jax.process_index(),
       "device_count": jax.device_count(),
       "local_device_count": jax.local_device_count()}}

# --- sampler shards disjointly per process ------------------------------
from versband_tpu.data.sampler import IndexBatchSampler

sampler = IndexBatchSampler(range(32), batch_size=4, shuffle=False)
out["batches"] = sampler.batches
out["num_replicas"] = sampler.num_replicas

# --- global mesh psum + DP train step -----------------------------------
mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))

rng = np.random.RandomState(0)
W0 = rng.randn(8, 8).astype(np.float32)
X = rng.randn(16, 8).astype(np.float32)   # global batch
Y = rng.randn(16, 8).astype(np.float32)

def loss_fn(w, x, y):
    return jnp.mean((x @ w - y) ** 2)

def step(w, x, y):
    g = jax.grad(loss_fn)(w, x, y)
    return w - 0.1 * g

with mesh:
    xs = NamedSharding(mesh, P("data"))
    ws = NamedSharding(mesh, P())
    jstep = jax.jit(step, in_shardings=(ws, xs, xs), out_shardings=ws)
    # multi-controller: feed only this host's addressable shards
    def put_global(arr, sharding):
        global_shape = arr.shape
        arrs = [jax.device_put(arr[index], d)
                for d, index in sharding.addressable_devices_indices_map(
                    global_shape).items()]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrs)

    wg = put_global(W0, ws)
    xg = put_global(X, xs)
    yg = put_global(Y, xs)
    w1 = jstep(wg, xg, yg)
    # fully replicated output: any addressable shard IS the global array
    out["w1"] = np.asarray(jax.device_get(w1.addressable_data(0))).tolist()

    s = jax.jit(lambda x: x.sum(), out_shardings=ws)(xg)
    out["xsum"] = float(np.asarray(jax.device_get(s.addressable_data(0))))

print("CHILD_RESULT " + json.dumps(out))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process():
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        " --xla_force_host_platform_device_count=2").strip()
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, "-c",
         CHILD.format(repo=REPO, coord=coord, pid=i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    results = {}
    logs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=560)
        logs.append(stderr[-2000:])
        assert p.returncode == 0, f"child failed:\n{stderr[-4000:]}"
        for line in stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                r = json.loads(line[len("CHILD_RESULT "):])
                results[r["process_index"]] = r
    assert set(results) == {0, 1}, results.keys()

    r0, r1 = results[0], results[1]
    assert r0["device_count"] == 4 and r0["local_device_count"] == 2
    assert r0["num_replicas"] == 2 and r1["num_replicas"] == 2

    # disjoint batch shards covering all 8 batches exactly once
    b0 = {tuple(b) for b in r0["batches"]}
    b1 = {tuple(b) for b in r1["batches"]}
    assert b0.isdisjoint(b1)
    every = {tuple(range(i, i + 4)) for i in range(0, 32, 4)}
    assert b0 | b1 == every
    # rank striding: rank 0 takes even batch slots
    assert tuple(range(0, 4)) in b0

    # global data sum seen identically from both hosts
    rng = np.random.RandomState(0)
    rng.randn(8, 8)
    X = rng.randn(16, 8).astype(np.float32)
    assert abs(r0["xsum"] - float(X.sum())) < 1e-3
    assert abs(r1["xsum"] - r0["xsum"]) < 1e-6

    # DP step across 2 processes == single-process full-batch step
    rng = np.random.RandomState(0)
    W0 = rng.randn(8, 8).astype(np.float32)
    X = rng.randn(16, 8).astype(np.float32)
    Y = rng.randn(16, 8).astype(np.float32)
    pred = X @ W0
    g = 2.0 * X.T @ (pred - Y) / pred.size
    w1_ref = W0 - 0.1 * g
    np.testing.assert_allclose(np.array(r0["w1"]), w1_ref, atol=1e-5)
    np.testing.assert_allclose(np.array(r1["w1"]), np.array(r0["w1"]),
                               atol=1e-7)


# --- real sharded CFM train step across 2 processes (VERDICT r2 item 3b) ----

CFM_CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/tests")

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2,
                           process_id={pid})
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import mh_cfm_stack as mh
from versband_tpu.data.sampler import IndexBatchSampler
from versband_tpu.train.step import shard_train_step

out = {{"process_index": jax.process_index()}}

# (data=2, model=2) global mesh: data row h = host h's two local devices
mesh = Mesh(np.array(jax.devices()).reshape(2, 2), ("data", "model"))

cfm, state, step_fn = mh.build_cfm()

# real data path: rank-strided sampler (auto num_replicas/rank from
# jax.process_*) -> per-item load -> collate -> this host's half of the
# global batch
sampler = IndexBatchSampler(range(mh.N_ITEMS), batch_size=mh.BS,
                            shuffle=False)
out["my_batch"] = sampler.batches[0]
local = mh.collate_items(sampler.batches[0])

bs = NamedSharding(mesh, P("data"))
gbatch = {{k: jax.make_array_from_process_local_data(bs, v)
          for k, v in local.items()}}

with mesh:
    jitted, place_state, place_batch = shard_train_step(
        step_fn, state, gbatch, mesh)
    state = place_state(state)
    losses = []
    for i in range(2):
        state, metrics = jitted(state, gbatch, jax.random.PRNGKey(50 + i),
                                None)
        losses.append(float(jax.device_get(
            metrics["loss"].addressable_data(0))))
out["losses"] = losses
out["step"] = int(jax.device_get(state.step.addressable_data(0)))
print("CHILD_RESULT " + json.dumps(out))
"""


def test_two_process_real_cfm_step_matches_single_process():
    """The REAL sharded CFM train step (frozen-free latent batch, Band-MOE
    DiT loss, AdamW+EMA) over a 2-process (data=2, model=2) mesh, fed by the
    real IndexBatchSampler->collate path, must match the single-process run
    of the same global program."""
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        " --xla_force_host_platform_device_count=2").strip()
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, "-c",
         CFM_CHILD.format(repo=REPO, coord=coord, pid=i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    results = {}
    for p in procs:
        stdout, stderr = p.communicate(timeout=560)
        assert p.returncode == 0, f"child failed:\n{stderr[-4000:]}"
        for line in stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                r = json.loads(line[len("CHILD_RESULT "):])
                results[r["process_index"]] = r
    assert set(results) == {0, 1}, results.keys()
    r0, r1 = results[0], results[1]

    # disjoint halves of the dataset, in rank-strided order
    assert r0["my_batch"] == [0, 1, 2, 3]
    assert r1["my_batch"] == [4, 5, 6, 7]
    # both controllers observed the same global loss trajectory
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert r0["step"] == r1["step"] == 2

    # single-process reference: same global program on a local (2,2) mesh
    import jax

    import mh_cfm_stack as mh
    from versband_tpu.parallel import make_mesh
    from versband_tpu.train.step import shard_train_step

    cfm, state, step_fn = mh.build_cfm()
    gbatch = mh.collate_items(list(range(mh.N_ITEMS)))  # host0 rows + host1 rows
    mesh = make_mesh(2, 2, jax.devices()[:4])
    with mesh:
        jitted, place_state, place_batch = shard_train_step(
            step_fn, state, gbatch, mesh)
        state = place_state(state)
        b = place_batch(gbatch)
        ref_losses = []
        for i in range(2):
            state, metrics = jitted(state, b, jax.random.PRNGKey(50 + i),
                                    None)
            ref_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(r0["losses"], ref_losses, rtol=1e-4)
