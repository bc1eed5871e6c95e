from grl_tpu.parallel.graph_partition import (
    PartitionedGraph,
    all_gather_relational_aggregate,
    partition_graph,
    partitioned_relational_aggregate,
)
from grl_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "PartitionedGraph",
    "all_gather_relational_aggregate",
    "partition_graph",
    "partitioned_relational_aggregate",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_params",
    "DEFAULT_TP_RULES",
]
