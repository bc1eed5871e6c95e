from grl_tpu.trainer.procedures.base_procedure import BaseProcedure, TrainState
from grl_tpu.trainer.procedures.kv_procedure import KVProcedure

__all__ = ["BaseProcedure", "TrainState", "KVProcedure"]
