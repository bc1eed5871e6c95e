"""Checkpointing: orbax-backed pytree save/restore + JSON metadata.

Improves on the reference CheckpointHandler (reference:
gnn/utils/checkpoint_handler.py:17-60, torch.save of
``{epoch, config, meta_data, state_dict}``): full train state —
params, frozen constants, batch stats **and optimizer state + step** —
is saved (the reference never saved optimizer state, so resume restarted
optimization; SURVEY.md §5). Checkpoints are sharding-agnostic pytrees:
restore works across mesh shapes because orbax stores the global view.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from grl_tpu.utils.logging import get_logger


class CheckpointHandler:
    LATEST = "model_latest"

    def __init__(self):
        self.logger = get_logger(self.__class__.__name__)
        self._checkpointer = ocp.StandardCheckpointer()

    def make_checkpoint_name(self, name: str, epoch: Optional[int] = None,
                             step: Optional[int] = None) -> str:
        if epoch is None or step is None:
            return f"{name}_latest"
        return f"{name}_epoch_{epoch}_minibatch_{step}"

    def save_checkpoint(
        self,
        state: Any,
        output_dir: str,
        epoch: Optional[int] = None,
        step: Optional[int] = None,
        meta: Optional[Dict[str, Any]] = None,
        name: str = "model",
    ) -> str:
        """Save a pytree train state + JSON sidecar metadata."""
        os.makedirs(output_dir, exist_ok=True)
        ckpt_name = self.make_checkpoint_name(name, epoch, step)
        path = os.path.abspath(os.path.join(output_dir, ckpt_name))
        self._checkpointer.save(path, state, force=True)
        self._checkpointer.wait_until_finished()
        if meta is not None:
            with open(path + ".meta.json", "w", encoding="utf-8") as handle:
                json.dump(meta, handle, default=str, indent=2)
        self.logger.info(f"Saved checkpoint: {path}")
        return path

    def restore_checkpoint(self, path: str, target: Any = None) -> Any:
        """Restore a pytree; ``target`` provides structure/sharding."""
        path = os.path.abspath(path)
        if target is not None:
            target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
            state = self._checkpointer.restore(path, target)
        else:
            state = self._checkpointer.restore(path)
        self.logger.info(f"Restored checkpoint: {path}")
        return state

    @staticmethod
    def read_meta(path: str) -> Optional[Dict[str, Any]]:
        meta_path = os.path.abspath(path) + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as handle:
                return json.load(handle)
        return None
