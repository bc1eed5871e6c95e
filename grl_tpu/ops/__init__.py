from grl_tpu.ops.relconv import (
    drop_edge,
    preprocess_adjacency,
    relational_aggregate,
    relational_aggregate_dense,
    relational_neighbor_aggregate,
)
from grl_tpu.ops.segment import segment_softmax, segment_sum
from grl_tpu.ops.sparse import (
    RelationalGraph,
    dense_to_relational_coo,
    relational_aggregate_coo,
    relational_neighbor_coo,
)

__all__ = [
    "drop_edge",
    "preprocess_adjacency",
    "relational_aggregate",
    "relational_aggregate_dense",
    "relational_neighbor_aggregate",
    "segment_softmax",
    "segment_sum",
    "RelationalGraph",
    "dense_to_relational_coo",
    "relational_aggregate_coo",
    "relational_neighbor_coo",
]
