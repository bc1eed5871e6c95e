from grl_tpu.trainer import losses, lr_schedulers, metrics, optimizers, procedures
from grl_tpu.trainer.procedures import BaseProcedure, KVProcedure, TrainState

__all__ = [
    "losses",
    "lr_schedulers",
    "metrics",
    "optimizers",
    "procedures",
    "BaseProcedure",
    "KVProcedure",
    "TrainState",
]
