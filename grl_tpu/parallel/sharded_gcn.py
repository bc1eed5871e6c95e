"""Multi-chip full-graph training: node-partitioned relational GCN.

The end-to-end SP-analog train step for graphs too large for one chip
(BASELINE config 5): nodes, features and labels shard over the mesh's
``data`` axis; each device owns the edges targeting its nodes; sender
features flow through the ring ``ppermute`` halo exchange of
:mod:`grl_tpu.parallel.graph_partition` overlapped with local
aggregation; gradients ``psum`` across devices inside the same
shard_map — the whole step is one compiled SPMD program.

A compact functional 2-layer relational GCN (same GraphConv math as the
model family: self relation prepended, per-relation concat, one
``(L+1)F x C`` projection) keeps the shard_map body explicit; gradient
parity vs the single-device COO path is tested on the virtual mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from grl_tpu.parallel.graph_partition import (
    PartitionedGraph,
    _ring_aggregate_body,
)

P = PartitionSpec


def init_sharded_gcn_params(
    rng: jax.Array, feature_dim: int, hidden: int, num_classes: int, num_relations: int
) -> Dict[str, jnp.ndarray]:
    k1, k2 = jax.random.split(rng)
    L1 = num_relations + 1

    def glorot(key, shape):
        fan_in, fan_out = shape
        return jax.random.normal(key, shape) * (2.0 / (fan_in + fan_out)) ** 0.5

    return {
        "w1": glorot(k1, (feature_dim * L1, hidden)),
        "b1": jnp.zeros((hidden,)),
        "w2": glorot(k2, (hidden * L1, num_classes)),
        "b2": jnp.zeros((num_classes,)),
    }


def _local_forward(params, V_block, senders, relations, receivers_local,
                   weights, L, shard_n, axis):
    """Two GraphConv layers with ring-halo aggregation, device-local."""

    def conv(feats, w, b):
        neigh = _ring_aggregate_body(
            feats, senders, relations, receivers_local, weights,
            L, shard_n, axis,
        )
        agg = jnp.concatenate([feats, neigh], axis=-1)
        return agg @ w + b

    h = jax.nn.relu(conv(V_block, params["w1"], params["b1"]))
    return conv(h, params["w2"], params["b2"])


def make_sharded_train_step(
    mesh: Mesh,
    graph: PartitionedGraph,
    learning_rate: float = 1e-2,
    axis: str = "data",
):
    """Returns ``(train_step, eval_fn)`` jitted over the mesh.

    train_step(params, V, labels) -> (new_params, loss); ``V (N, F)`` and
    ``labels (N,)`` are sharded over ``axis``; params replicate.
    """
    D = mesh.shape[axis]
    shard_n = graph.num_nodes // D
    L = graph.num_relations

    def per_device(params, V_block, labels_block, senders, receivers,
                   relations, weights, mask):
        senders, receivers = senders[0], receivers[0]
        relations = relations[0]
        weights = (weights[0] * mask[0]).astype(V_block.dtype)
        d = jax.lax.axis_index(axis)
        receivers_local = receivers - d * shard_n

        def loss_fn(p):
            logits = _local_forward(
                p, V_block, senders, relations, receivers_local, weights,
                L, shard_n, axis,
            )
            valid = labels_block != -100
            safe = jnp.where(valid, labels_block, 0)
            nll = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), safe[:, None], axis=1
            )[:, 0]
            local_sum = jnp.sum(nll * valid)
            local_cnt = jnp.sum(valid).astype(jnp.float32)
            total = jax.lax.psum(local_sum, axis)
            count = jax.lax.psum(local_cnt, axis)
            return total / jnp.maximum(count, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # The loss already psums over devices, so grads of the replicated
        # params are identical across devices — no extra psum needed; mark
        # them unvarying for the out_specs.
        grads = jax.tree_util.tree_map(
            lambda gr: jax.lax.pmean(gr, axis), grads
        )
        new_params = jax.tree_util.tree_map(
            lambda pp, gg: pp - learning_rate * gg, params, grads
        )
        return new_params, jax.lax.pmean(loss, axis)

    edge_spec = P(axis, None)
    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), edge_spec, edge_spec,
                  edge_spec, edge_spec, edge_spec),
        out_specs=(P(), P()),
    )

    @jax.jit
    def train_step(params, V, labels):
        return shard_fn(
            params, V, labels, graph.senders, graph.receivers,
            graph.relations, graph.weights, graph.mask,
        )

    def forward(params, V):
        def fwd_device(params, V_block, senders, receivers, relations, weights, mask):
            senders, receivers = senders[0], receivers[0]
            relations = relations[0]
            weights = (weights[0] * mask[0]).astype(V_block.dtype)
            d = jax.lax.axis_index(axis)
            return _local_forward(
                params, V_block, senders, relations, receivers - d * shard_n,
                weights, L, shard_n, axis,
            )

        return jax.jit(
            jax.shard_map(
                fwd_device,
                mesh=mesh,
                in_specs=(P(), P(axis, None), edge_spec, edge_spec, edge_spec,
                          edge_spec, edge_spec),
                out_specs=P(axis, None),
            )
        )(params, V, graph.senders, graph.receivers, graph.relations,
          graph.weights, graph.mask)

    return train_step, forward
