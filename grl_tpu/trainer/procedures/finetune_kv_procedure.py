"""Finetune: KVProcedure with a shape-matched partial backbone load.

Re-design of the reference FinetuneKVProcedure (reference: gnn/trainer/
training_procedures/finetune_kv_procedure.py:23-62): leaves of the
pretrained checkpoint are merged into the fresh model wherever the path
exists and the shape matches; everything else (e.g. a new classifier head)
keeps its fresh initialization.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from grl_tpu.config import ConfigDict
from grl_tpu.trainer.procedures.base_procedure import TrainState
from grl_tpu.trainer.procedures.kv_procedure import KVProcedure


def merge_matching_leaves(target: Any, source: Any, logger=None, prefix: str = "") -> Tuple[Any, int]:
    """Recursively overwrite target leaves with same-path same-shape source
    leaves; returns (merged, num_loaded)."""
    if isinstance(target, dict):
        merged: Dict[str, Any] = {}
        loaded = 0
        for key, value in target.items():
            if isinstance(source, dict) and key in source:
                merged[key], n = merge_matching_leaves(
                    value, source[key], logger, f"{prefix}/{key}"
                )
                loaded += n
            else:
                merged[key] = value
                if logger:
                    logger.warning(f"Not found pre-trained parameters for {prefix}/{key}")
        return merged, loaded
    # Leaf.
    if source is not None and np.shape(target) == np.shape(source):
        return source, 1
    if logger:
        logger.warning(f"Shape mismatch for {prefix}: kept fresh init")
    return target, 0


class FinetuneKVProcedure(KVProcedure):
    def __init__(self, model: Any, config: ConfigDict, **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self._backbone_path = self.config.get_path("optimize_settings.ssl_pretrain_path")

    def init_state(self, example_inputs) -> TrainState:
        state = super().init_state(example_inputs)
        if not self._backbone_path:
            self.logger.info("Not found any pretrained model!")
            return state
        self.logger.info("Restoring pretrained backbone ...")
        raw = self.checkpointer.restore_checkpoint(self._backbone_path)
        params, n_params = merge_matching_leaves(
            state.params, raw.get("params"), self.logger
        )
        constants = state.constants
        if constants is not None and raw.get("constants") is not None:
            constants, _ = merge_matching_leaves(constants, raw["constants"])
        self.logger.info(f"Loaded {n_params} pretrained parameter tensors.")
        state = state.replace(params=params, constants=constants)
        self.state = state
        return state
