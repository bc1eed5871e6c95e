from grl_tpu.models.base import (
    MODEL_REGISTRY,
    count_parameters,
    create_model,
    init_model,
    register_model,
)
from grl_tpu.models.cosine_linear import (
    CosineLinear,
    CosineLinearBiFeat,
    GroupCosineLinear,
    SplitCosineLinear,
    SplitCosineLinearBiFeat,
    SplitGroupCosineLinear,
)
from grl_tpu.models.gcn_family import (
    GCNTrunk,
    GraphCNNDropEdge,
    ModGCN,
    RobustGCN,
    RPGraphCNNDropEdge,
)
from grl_tpu.models.layers import (
    BatchNorm,
    EdgeDropout,
    EmbeddingBlock,
    GCNBlock,
    GraphConv,
    LinearReLU,
    NodeSelfAtten,
    RanPAC,
)

__all__ = [
    "MODEL_REGISTRY",
    "count_parameters",
    "create_model",
    "init_model",
    "register_model",
    "GCNTrunk",
    "GraphCNNDropEdge",
    "ModGCN",
    "RobustGCN",
    "RPGraphCNNDropEdge",
    "BatchNorm",
    "EdgeDropout",
    "EmbeddingBlock",
    "GCNBlock",
    "GraphConv",
    "LinearReLU",
    "NodeSelfAtten",
    "RanPAC",
    "CosineLinear",
    "CosineLinearBiFeat",
    "GroupCosineLinear",
    "SplitCosineLinear",
    "SplitCosineLinearBiFeat",
    "SplitGroupCosineLinear",
]
