"""Sharding rules: param-path patterns -> PartitionSpec over the (data, model) mesh.

The scaling-book recipe: annotate leaf shardings, let XLA insert the
collectives. Rules are ordered regex patterns over flattened flax param paths
(e.g. ``blocks_0/attention/wq/kernel``). Anything unmatched is replicated.

TP: attention projections split over heads (column-parallel wq/wk/wv, row-
parallel wo) and SwiGLU split over hidden (column w1/w3, row w2) — one
all-reduce per attention and per FFN, the classic Megatron layout, expressed
purely through shardings.

EP: stacked expert tensors ``[E, ...]`` split over their leading expert axis —
the Band-MOE evaluates all experts densely and mixes (see models/dit.py), so EP
sharding turns the expert einsums into per-device expert slabs and the mixture
into a psum, again inserted by XLA.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from versband_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (pattern, spec-builder) — first match wins; builder gets the param ndim.
# Specs are written for 2-D [in, out] dense kernels / 3-D [E, in, out] stacks /
# conv kernels [k, in, out]; None entries replicate that axis.
PARAM_RULES: List[Tuple[str, Any]] = [
    # Band-MOE stacked experts [E, d, h] / [E, h, d]: EP over the expert axis.
    (r"(caption|acoustic|freq)_experts/w[123]$", lambda nd: P(MODEL_AXIS, None, None)),
    # Attention column-parallel (out dim = heads*head_dim).
    (r"attention/w[qkv](_y)?/kernel$", lambda nd: P(None, MODEL_AXIS)),
    (r"cross_attention/w[qkv]/kernel$", lambda nd: P(None, MODEL_AXIS)),
    # Attention row-parallel output proj.
    (r"attention/wo/kernel$", lambda nd: P(MODEL_AXIS, None)),
    (r"cross_attention/wo/kernel$", lambda nd: P(MODEL_AXIS, None)),
    # Dense SwiGLU FFN (non-MoE uses of FeedForward).
    (r"feed_forward/w[13]/kernel$", lambda nd: P(None, MODEL_AXIS)),
    (r"feed_forward/w2/kernel$", lambda nd: P(MODEL_AXIS, None)),
    # Per-head gate vectors stay replicated (tiny).
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path: str, ndim: int, model_size: int, shape) -> P:
    for pattern, builder in PARAM_RULES:
        if re.search(pattern, path):
            spec = builder(ndim)
            # Drop the rule if the sharded axis doesn't divide evenly.
            entries = list(spec) + [None] * (ndim - len(spec))
            ok = True
            for dim, axis in zip(shape, entries):
                if axis == MODEL_AXIS and dim % model_size:
                    ok = False
            if ok:
                return P(*entries[:ndim])
            return P()
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a param pytree, by path-pattern rules."""
    model_size = mesh.shape[MODEL_AXIS]

    def leaf(path, x):
        spec = _spec_for(_path_str(path), x.ndim, model_size, x.shape)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    """Shard every array's leading (batch) axis over 'data'; scalars replicate."""

    def leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
