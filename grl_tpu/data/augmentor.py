"""Augmentors.

The reference ships only an abstract ``BaseAugmentor`` with no concrete
implementations (reference: gnn/data_generator/augmentor/base_augmentor.py:
4-12, __init__.py). We provide the same extension point plus one concrete
graph augmentor (node deletion) used by SSL graph-edit-distance
pretraining, which the reference's ssl pipeline consumes via
``aug_adjacency_matrix``/``graph_edit_history`` sample keys
(reference: gnn/data_generator/data_process/ssl_labeling.py:133-146).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


class BaseAugmentor:
    @classmethod
    def _from_config(cls, config: Dict[str, Any]) -> "BaseAugmentor":
        return cls(**dict(config or {}))

    def __call__(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError


class NodeDropAugmentor(BaseAugmentor):
    """Randomly delete nodes to create an augmented graph copy.

    Populates ``aug_adjacency_matrix`` and ``graph_edit_history`` (list of
    ``(node_idx, "delete")``) for graph-edit-distance SSL targets.
    Runs after HeuristicGraphBuilder in the processor chain.
    """

    def __init__(self, drop_rate: float = 0.1, seed: int | None = None):
        self.drop_rate = drop_rate
        self.rng = np.random.RandomState(seed)

    def __call__(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        adj = sample.get("adjacency_matrix")
        if adj is None:
            return sample
        n = adj.shape[0]
        keep = self.rng.rand(n) >= self.drop_rate
        if keep.all() and n > 1:  # always edit at least one node
            keep[self.rng.randint(n)] = False
        dropped = np.nonzero(~keep)[0]
        aug = adj[keep][:, :, keep]
        sample["aug_adjacency_matrix"] = aug
        if "textline_encoding" in sample:
            sample["aug_textline_encoding"] = sample["textline_encoding"][keep]
        sample["graph_edit_history"] = [(int(i), "delete") for i in dropped]
        return sample


class DGINegativeSampling(BaseAugmentor):
    """Standard DGI corruption: row-shuffle node features, keep topology.

    Provides ``negative_textline_encoding``/``negative_adjacency_matrix``
    consumed by the dgi SSL task (reference: gnn/trainer/
    training_procedures/ssl_pretrain_procedure.py:90-101).
    """

    def __init__(self, seed: int | None = None):
        self.rng = np.random.RandomState(seed)

    def __call__(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        feats = sample.get("textline_encoding")
        if feats is None:
            return sample
        perm = self.rng.permutation(feats.shape[0])
        sample["negative_textline_encoding"] = feats[perm]
        sample["negative_adjacency_matrix"] = sample["adjacency_matrix"]
        return sample
