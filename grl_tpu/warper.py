"""API facade: ``GNNLearningWarper`` — train/predict from a config.

TPU-native counterpart of the reference facade
(reference: gnn/cl_warper.py:19-115): loads YAML config, seeds RNG,
instantiates the configured procedure (training or inference) and exposes
``.train()`` / ``.predict(samples)``. Instead of NCCL process-group setup
(reference: cl_warper.py:73-75) multi-chip execution comes from
``jax.sharding`` meshes configured in :mod:`grl_tpu.parallel`.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Union

import jax

from grl_tpu.config import ConfigDict, load_config
from grl_tpu.utils.logging import get_logger


class GNNLearningWarper:
    def __init__(
        self,
        model: Any = None,
        config_path: Optional[str] = None,
        config: Optional[Union[ConfigDict, Dict[str, Any]]] = None,
    ):
        """Wrap the full graph-learning lifecycle behind one object.

        Args:
            model: a flax network instance (see :mod:`grl_tpu.models`); if
                ``None``, built from ``config.model`` via the registry.
            config_path: path to a YAML config file.
            config: alternatively, an already-loaded config.
        """
        assert config_path or config is not None
        self.config = load_config(config_path) if config_path else ConfigDict(config)
        self.logger = get_logger(__name__)

        if model is None and "model" in self.config:
            from grl_tpu.models import create_model

            spec = self.config.model
            model = create_model(spec["type"], **dict(spec.get("args", {})))
        self.model = model

        output_dir = os.path.join(
            self.config.get("output_dir", "./outputs"),
            self.config.get("experiment_name", "experiment"),
        )
        os.makedirs(output_dir, exist_ok=True)
        self.config["output_dir"] = output_dir

        # Multi-host runtime (replaces the reference's NCCL process-group
        # init — reference: cl_warper.py:73-75): derives host_id/num_hosts
        # into the config for per-host data sharding; no-op single-process.
        from grl_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(self.config)

        self.seed = int(self.config.get("seed", 0))
        self.rng = jax.random.PRNGKey(self.seed)

        self.trainer = None
        self.inferencer = None
        if self.config.get("is_train", True):
            from grl_tpu.trainer import procedures
            from grl_tpu.utils.experiment import ExperimentRun

            # Experiment-tracking handle threaded into the procedure
            # (reference: cl_warper.py:52-53 passes the global NEPTUNE_RUN).
            ems_exp = None
            if self.config.get_path("logging.experiment_tracking", True):
                ems_exp = ExperimentRun(output_dir)
            proc = self.config.get("procedure", {"type": "KVProcedure", "args": {}})
            cls = getattr(procedures, proc["type"])
            self.trainer = cls(
                self.model, self.config, ems_exp=ems_exp,
                **dict(proc.get("args", {}) or {}),
            )
        else:
            from grl_tpu.inferencer import inference_procedures

            proc = self.config.get("procedure", {"type": "KVInference", "args": {}})
            cls = getattr(inference_procedures, proc["type"])
            self.inferencer = cls(self.model, self.config, **dict(proc.get("args", {}) or {}))

    @staticmethod
    def _from_config(config_path: str) -> ConfigDict:
        """Load a YAML config (reference: cl_warper.py:62-79)."""
        return load_config(config_path)

    def train(self) -> Any:
        """Run the configured training procedure; returns its final metric."""
        if self.trainer is None:
            raise RuntimeError("Warper was built with is_train=False.")
        return self.trainer()

    def predict(self, samples: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """Run the configured inference procedure on raw samples."""
        if self.inferencer is None:
            raise RuntimeError("Warper was built with is_train=True.")
        return self.inferencer(samples)
