"""Node-partitioned training of the PRODUCT model family (SP analog).

The real flax networks — GraphCNNDropEdge and friends in
sparse mode — run under ``shard_map``: nodes/features/labels shard over
the mesh axis, every GraphConv inside the model does the ring-``ppermute``
halo aggregation via the :class:`LocalShardGraph` adjacency, DropEdge
draws per-device masks, the loss ``psum``s across shards and gradients
``pmean`` — one compiled SPMD program for the whole train step.

The reference has no counterpart (its graphs are densely padded per page
— SURVEY.md §2.6 SP row); this is the BASELINE config-5 capability.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec

from grl_tpu.parallel.graph_partition import (
    PartitionedGraph,
    local_shard_graph,
)

P = PartitionSpec


def pad_node_arrays(
    features: Optional[np.ndarray], labels: np.ndarray,
    num_nodes_padded: int, label_pad: int = -100,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Pad node-space arrays to the partitioned (device-divisible) count;
    pad labels with the ignore value so the masked loss is unchanged.
    ``features=None`` pads labels only (callers placing several label
    sets need the features copy once — ADVICE r4 #3)."""
    labels = np.concatenate(
        [labels, np.full(num_nodes_padded - len(labels), label_pad,
                         labels.dtype)]
    ) if num_nodes_padded > len(labels) else labels
    if features is not None and num_nodes_padded > features.shape[0]:
        pad = num_nodes_padded - features.shape[0]
        features = np.concatenate(
            [features, np.zeros((pad, features.shape[1]), features.dtype)]
        )
    return features, labels


def scatter_node_arrays(
    node_perm: np.ndarray, features: Optional[np.ndarray],
    labels: np.ndarray, num_nodes_padded: int, label_pad: int = -100,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Place node arrays in partition order for a degree-BALANCED plan
    (``PartitionedGraph.node_perm``): row ``node_perm[i]`` holds original
    node ``i``; unassigned slots are zero features / ignored labels, so
    the masked loss and accuracy are unchanged. ``features=None``
    scatters labels only — avoids building and discarding a full
    ``(num_nodes_padded, F)`` copy (~87 MB at arxiv scale) when a second
    label set shares the same placement (ADVICE r4 #3)."""
    out_l = np.full(num_nodes_padded, label_pad, labels.dtype)
    out_l[node_perm] = labels
    if features is None:
        return None, out_l
    out_f = np.zeros((num_nodes_padded, features.shape[1]), features.dtype)
    out_f[node_perm] = features
    return out_f, out_l


def make_partitioned_model_step(
    model: Any,
    mesh: Mesh,
    graph: PartitionedGraph,
    tx: optax.GradientTransformation,
    axis: str = "data",
) -> Tuple[Callable, Callable]:
    """(train_step, forward) for a flax network in sparse mode, node-
    partitioned over ``axis``.

    ``train_step(params, constants, opt_state, V, labels, rng)`` ->
    ``(new_params, new_opt_state, loss)``; ``V (num_nodes, F)`` and
    ``labels (num_nodes,)`` shard over ``axis``, params/opt replicate.
    """
    D = mesh.shape[axis]
    shard_n = graph.num_nodes // D
    L = graph.num_relations

    def build_local(senders, receivers, relations, weights, mask):
        return local_shard_graph(
            senders, receivers, relations, weights, mask,
            shard_n=shard_n, num_relations=L, axis=axis,
        )

    def per_device(params, constants, opt_state, V_blk, labels_blk, rng,
                   senders, receivers, relations, weights, mask):
        local = build_local(senders, receivers, relations, weights, mask)
        # Independent dropout/DropEdge per shard.
        dev_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(p):
            variables = {"params": p}
            if constants is not None:
                variables["constants"] = constants
            logits = model.apply(
                variables, (V_blk, local), train=True,
                rngs={"dropout": dev_rng},
            )
            valid = labels_blk != -100
            safe = jnp.where(valid, labels_blk, 0)
            nll = -jnp.take_along_axis(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                safe[:, None], axis=1,
            )[:, 0]
            total = jax.lax.psum(jnp.sum(nll * valid), axis)
            count = jax.lax.psum(jnp.sum(valid).astype(jnp.float32), axis)
            return total / jnp.maximum(count, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, jax.lax.pmean(loss, axis)

    edge = P(axis, None, None)
    shard_train = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None), P(axis), P(),
                  edge, edge, edge, edge, edge),
        out_specs=(P(), P(), P()),
    )

    @jax.jit
    def train_step(params, constants, opt_state, V, labels, rng):
        return shard_train(
            params, constants, opt_state, V, labels, rng,
            graph.senders, graph.receivers, graph.relations,
            graph.weights, graph.mask,
        )

    def fwd_device(params, constants, V_blk, senders, receivers, relations,
                   weights, mask):
        local = build_local(senders, receivers, relations, weights, mask)
        variables = {"params": params}
        if constants is not None:
            variables["constants"] = constants
        return model.apply(variables, (V_blk, local), train=False)

    shard_fwd = jax.shard_map(
        fwd_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), edge, edge, edge, edge, edge),
        out_specs=P(axis, None),
    )

    @jax.jit
    def forward(params, constants, V):
        return shard_fwd(
            params, constants, V, graph.senders, graph.receivers,
            graph.relations, graph.weights, graph.mask,
        )

    return train_step, forward
