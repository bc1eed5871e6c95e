"""Synthetic large relational graphs (OGB-style benchmarks without egress).

The BASELINE targets reference ogbn-arxiv/products/papers100M; this
environment has no network access, so scale/accuracy runs use stochastic
block model graphs with community-correlated features: a GCN that
aggregates correctly reaches high accuracy, a broken sparse path cannot.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from grl_tpu.ops.sparse import RelationalGraph


class LargeGraphData(NamedTuple):
    features: np.ndarray  # (N, F) float32
    labels: np.ndarray  # (N,) int32
    senders: np.ndarray  # (E,)
    receivers: np.ndarray  # (E,)
    relations: np.ndarray  # (E,)
    weights: np.ndarray  # (E,)
    train_mask: np.ndarray  # (N,) bool
    val_mask: np.ndarray  # (N,) bool
    num_classes: int
    num_relations: int


def sbm_relational_graph(
    num_nodes: int = 10_000,
    num_classes: int = 8,
    num_relations: int = 3,
    avg_degree: float = 10.0,
    feature_dim: int = 64,
    homophily: float = 0.8,
    noise: float = 2.0,
    train_fraction: float = 0.6,
    seed: int = 0,
) -> LargeGraphData:
    """Directed SBM: edges prefer same-community endpoints; features are a
    noisy community one-hot embedding."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, num_nodes).astype(np.int32)
    E = int(num_nodes * avg_degree)
    senders = rng.randint(0, num_nodes, 2 * E).astype(np.int32)
    receivers = np.empty_like(senders)
    same = rng.rand(2 * E) < homophily
    # same-community edges: pick receiver from the sender's community.
    order = np.argsort(labels, kind="stable")
    class_starts = np.searchsorted(labels[order], np.arange(num_classes))
    class_counts = np.bincount(labels, minlength=num_classes)
    pick = rng.randint(0, np.maximum(class_counts[labels[senders]], 1))
    receivers[same] = order[class_starts[labels[senders[same]]] + pick[same]]
    receivers[~same] = rng.randint(0, num_nodes, (~same).sum())
    keep = senders != receivers
    senders, receivers = senders[keep][:E], receivers[keep][:E]
    relations = rng.randint(0, num_relations, len(senders)).astype(np.int32)
    # Deduplicate (sender, relation, receiver) triples so COO multiplicity
    # matches a binary dense adjacency.
    triples = np.unique(
        np.stack([senders, relations, receivers], axis=1), axis=0
    )
    senders, relations, receivers = (
        triples[:, 0].astype(np.int32),
        triples[:, 1].astype(np.int32),
        triples[:, 2].astype(np.int32),
    )

    basis = rng.randn(num_classes, feature_dim).astype(np.float32)
    features = basis[labels] + noise * rng.randn(num_nodes, feature_dim).astype(np.float32)

    train_mask = rng.rand(num_nodes) < train_fraction
    val_mask = ~train_mask
    return LargeGraphData(
        features=features,
        labels=labels,
        senders=senders,
        receivers=receivers,
        relations=relations,
        weights=np.ones(len(senders), np.float32),
        train_mask=train_mask,
        val_mask=val_mask,
        num_classes=num_classes,
        num_relations=num_relations,
    )


def to_relational_graph(
    data: LargeGraphData, edge_bucket: int | None = None
) -> Tuple[RelationalGraph, np.ndarray]:
    """Pack a LargeGraphData into a static-shape RelationalGraph
    (+ returns features)."""
    import jax.numpy as jnp

    E = len(data.senders)
    cap = edge_bucket or E
    pad = cap - E
    if pad < 0:
        raise ValueError(f"edge bucket {cap} < {E}")

    def pad_arr(arr, value=0):
        return np.concatenate([arr, np.full(pad, value, arr.dtype)])

    graph = RelationalGraph(
        senders=jnp.asarray(pad_arr(data.senders)),
        receivers=jnp.asarray(pad_arr(data.receivers)),
        relations=jnp.asarray(pad_arr(data.relations)),
        weights=jnp.asarray(pad_arr(data.weights)),
        mask=jnp.asarray(np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])),
        num_nodes=len(data.features),
        num_relations=data.num_relations,
    )
    return graph, data.features
