from grl_tpu.data.augmentor import BaseAugmentor, NodeDropAugmentor
from grl_tpu.data.collate import (
    BucketPadding,
    NumpyPadding,
    SparseBucketPadding,
    stack_batch,
)
from grl_tpu.data.dataloader import BaseDataLoader, DataLoader
from grl_tpu.data.datasets import (
    BaseDataset,
    CassiaDataset,
    DatapileDataset,
    DMDataset,
)
from grl_tpu.data.features import char_bow_matrix, encode_textlines
from grl_tpu.data.graph_builder import (
    EDGE_LABELS,
    HeuristicGraph,
    build_heuristic_adjacency,
)
from grl_tpu.data.normalize_text import normalize_text
from grl_tpu.data.processors import (
    BaseDataProcess,
    CLNodeLabeling,
    EdgeLabeling,
    GraphLabeling,
    HeuristicGraphBuilder,
    NodeLabeling,
    SSLLabeling,
    TextlineEncoding,
)

__all__ = [
    "BaseAugmentor",
    "NodeDropAugmentor",
    "BucketPadding",
    "NumpyPadding",
    "stack_batch",
    "BaseDataLoader",
    "DataLoader",
    "BaseDataset",
    "CassiaDataset",
    "DatapileDataset",
    "DMDataset",
    "char_bow_matrix",
    "encode_textlines",
    "EDGE_LABELS",
    "HeuristicGraph",
    "build_heuristic_adjacency",
    "normalize_text",
    "BaseDataProcess",
    "CLNodeLabeling",
    "EdgeLabeling",
    "GraphLabeling",
    "HeuristicGraphBuilder",
    "NodeLabeling",
    "SSLLabeling",
    "TextlineEncoding",
]
