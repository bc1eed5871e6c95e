from grl_tpu.parallel.distributed import initialize_distributed
from grl_tpu.parallel.graph_partition import (
    LocalShardGraph,
    PartitionedGraph,
    all_gather_relational_aggregate,
    local_shard_graph,
    partition_graph,
    partitioned_relational_aggregate,
)
from grl_tpu.parallel.sharded_flagship import (
    make_partitioned_model_step,
    pad_node_arrays,
)
from grl_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "initialize_distributed",
    "LocalShardGraph",
    "PartitionedGraph",
    "local_shard_graph",
    "make_partitioned_model_step",
    "pad_node_arrays",
    "all_gather_relational_aggregate",
    "partition_graph",
    "partitioned_relational_aggregate",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_params",
    "DEFAULT_TP_RULES",
]
