"""grl_tpu — a TPU-native graph representation learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``hoangthanh283/graph-representation-learning`` (reference mounted at
``/root/reference``): config-driven training/inference for document
key-value extraction as node classification over heuristic
multi-relational graphs, plus the full multi-relational GCN/GAT model
family, SSL pretraining, and OGB-scale sparse message passing.

Design stance (not a port):
  * functional models (flax.linen) with pytree params,
  * one jitted train step (value_and_grad + optax) instead of an epoch
    of eager ops,
  * static shapes via bucketed padding instead of per-batch max-shape
    padding (reference: gnn/data_generator/data_collate/numpy_padding.py),
  * dense relational aggregation formulated as MXU-shaped einsums and a
    Pallas SpMM path for sparse/big graphs,
  * scale-out through jax.sharding meshes + shard_map collectives
    instead of NCCL DDP (reference: gnn/cl_warper.py:73-75).
"""

from grl_tpu.version import __version__
from grl_tpu.warper import GNNLearningWarper

_packages = [
    "grl_tpu.ops",
    "grl_tpu.models",
    "grl_tpu.data",
    "grl_tpu.trainer",
    "grl_tpu.inferencer",
    "grl_tpu.parallel",
    "grl_tpu.utils",
]

__all__ = ["GNNLearningWarper", "__version__", "_packages"]
