from grl_tpu.trainer.procedures.base_procedure import BaseProcedure, TrainState
from grl_tpu.trainer.procedures.full_graph_procedure import FullGraphProcedure
from grl_tpu.trainer.procedures.finetune_kv_procedure import (
    FinetuneKVProcedure,
    merge_matching_leaves,
)
from grl_tpu.trainer.procedures.graph_classification_procedure import (
    GraphClassificationProcedure,
)
from grl_tpu.trainer.procedures.joint_training_procedure import JointTrainingProcedure
from grl_tpu.trainer.procedures.kv_procedure import KVProcedure
from grl_tpu.trainer.procedures.sampled_graph_procedure import (
    SampledGraphProcedure,
)
from grl_tpu.trainer.procedures.ssl_pretrain_procedure import SSLPretrainProcedure

__all__ = [
    "FullGraphProcedure",
    "SampledGraphProcedure",
    "BaseProcedure",
    "TrainState",
    "KVProcedure",
    "FinetuneKVProcedure",
    "merge_matching_leaves",
    "GraphClassificationProcedure",
    "JointTrainingProcedure",
    "SSLPretrainProcedure",
]
