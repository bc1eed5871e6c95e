"""KV inference: annotate raw OCR textlines with predicted (formal_key,
key_type, confidence).

Re-design of the reference KVInference (reference:
gnn/inferencer/inference_procedures/kv_inference.py:14-118 and
base_procedure.py:13-144). Key behavioral upgrade: the reference runs one
un-batched forward per page with a fresh H2D copy each time
(kv_inference.py:113); here pages are bucket-padded and batched through
one cached jit executable per bucket — same I/O contract
(tests/assets/schemas/* in the reference), TPU-shaped execution.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from grl_tpu.config import ConfigDict, instantiate
from grl_tpu.data.collate import next_bucket
from grl_tpu.data.dataloader import BaseDataLoader
from grl_tpu.utils.checkpoint import CheckpointHandler
from grl_tpu.utils.input_wrapper import cast_label_to_list, handle_single_input
from grl_tpu.utils.logging import get_logger


class BaseProcedure:
    """Inference setup: checkpoint load + post-processor registry
    (reference: inference_procedures/base_procedure.py:13-144)."""

    def __init__(self, model: Any, config: ConfigDict, **kwargs: Any):
        self.logger = get_logger(self.__class__.__name__)
        self.config = ConfigDict(config)
        self.model = model
        self.checkpointer = CheckpointHandler()
        self.variables = self._load_checkpoint_variables()
        self.post_processors = self._load_post_processors()

    @classmethod
    def _from_config(cls, model: Any, config: ConfigDict, **kwargs: Any):
        return cls(model, config, **kwargs)

    def _load_checkpoint_variables(self) -> Optional[Dict[str, Any]]:
        path = self.config.get("checkpoint_path")
        if not path:
            self.logger.warning("No checkpoint_path configured — random params.")
            return None
        raw = self.checkpointer.restore_checkpoint(path)
        variables = {"params": raw["params"]}
        for collection in ("constants", "batch_stats"):
            if raw.get(collection) is not None:
                variables[collection] = raw[collection]
        return variables

    def _load_post_processors(self) -> List[Any]:
        from grl_tpu.inferencer import post_processing as pp_module

        chain = []
        for spec in self.config.get_path("inference_settings.post_processing", []) or []:
            chain.append(instantiate(pp_module, spec))
        return chain


class KVInference(BaseProcedure):
    def __init__(self, model: Any, config: ConfigDict, batch_size: int = 8, **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self.batch_size = batch_size
        loader_factory = BaseDataLoader(self.config)
        ds_spec = self.config.get_path("inference_settings.datasets")
        self.dataset = loader_factory._load_dataset(
            ds_spec["type"], ds_spec.get("args", {}), data_type="inference"
        )
        self.id_to_class = dict(self.dataset.id_to_class)
        self.id_to_class[0] = ("other", "other")
        if self.variables is not None:
            # Orbax restores NUMPY arrays; as jit arguments those are
            # re-uploaded on EVERY dispatch (~15 MB of production-scale
            # params per batch — measured 1.4 s of the 64-page request
            # through the tunnel). Pin them to the device once.
            self.variables = jax.device_put(self.variables)
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, variables, V, A):
        logits = self.model.apply(variables, (V, A), train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        scores = jnp.max(probs, axis=-1)
        classes = jnp.argmax(probs, axis=-1)
        return scores, classes

    def _encode_samples(
        self, samples: List[List[Dict[str, Any]]]
    ) -> List[Tuple[Dict[str, Any], int]]:
        self.dataset.list_samples = self.dataset._load_samples(samples)
        encoded = []
        for idx in range(len(self.dataset)):
            sample = self.dataset[idx]
            encoded.append((sample, len(sample["label"])))
        return encoded

    def _annotate(
        self,
        raw: List[Dict[str, Any]],
        classes: np.ndarray,
        scores: np.ndarray,
    ) -> List[Dict[str, Any]]:
        """Write key_type/formal_key/confidence back onto the input boxes
        (reference: kv_inference.py:64-77)."""
        outputs = []
        for i, box in enumerate(raw):
            formal_key, key_type = self.id_to_class[int(classes[i])]
            box = dict(box)
            box["key_type"] = key_type
            box["formal_key"] = formal_key
            box["confidence"] = float(scores[i])
            outputs.append(box)
        return outputs

    @handle_single_input(cast_label_to_list)
    def __call__(
        self, samples: Union[List[Dict[str, Any]], List[List[Dict[str, Any]]]]
    ) -> List[List[Dict[str, Any]]]:
        """Predict entities for cassia-format pages.

        Input/output contract matches the reference exactly
        (reference: kv_inference.py:80-101): each page is a list of
        ``{"location": [[x,y]x4], "text": ...}`` boxes; outputs add
        ``key_type``/``formal_key``/``confidence`` per box.
        """
        if self.variables is None:
            raise RuntimeError("KVInference requires a checkpoint_path.")
        samples = list(samples)
        # A single page IS a list of box dicts; the reference forces callers
        # to nest it (kv_inference.py:106-108 commented-out handling).
        # Detect box dicts and wrap so both forms work.
        single_page = bool(samples) and all(
            isinstance(box, dict) and "location" in box for box in samples
        )
        if single_page:
            samples = [samples]
        self.logger.info(f"Start processing {len(samples)} samples ...")
        encoded = self._encode_samples(samples)
        outputs: List[Optional[List[Dict[str, Any]]]] = [None] * len(encoded)

        # Group pages into same-bucket batches for cached executables.
        # TWO-PHASE dispatch: every bucket batch is ENQUEUED first (the
        # device results stay as lazy jax arrays, so dispatches pipeline
        # through the accelerator link), and fetched+annotated in a
        # second pass — one effective host<->device sync for the whole
        # request instead of one per batch (through the TPU tunnel a
        # sync costs 2-60 ms; per-batch fetching made serving
        # dispatch-latency-bound at ~8 pages per round-trip).
        order = sorted(range(len(encoded)), key=lambda i: encoded[i][1])
        pending = []
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            bucket = next_bucket(max(encoded[i][1] for i in chunk), quantum=64)
            V = np.zeros((len(chunk), bucket, encoded[chunk[0]][0]["textline_encoding"].shape[-1]), np.float32)
            A = np.zeros((len(chunk), bucket, 6, bucket), np.float32)
            for row, i in enumerate(chunk):
                sample, n = encoded[i]
                V[row, :n] = sample["textline_encoding"]
                adj = np.asarray(sample["adjacency_matrix"], np.float32)
                A[row, :n, : adj.shape[1], :n] = adj
            scores, classes = self._forward(self.variables, jnp.asarray(V), jnp.asarray(A))
            pending.append((chunk, scores, classes))
        # Start EVERY device->host copy before touching any result: the
        # per-batch outputs are tiny ((B, bucket) scores/classes) so the
        # fetch cost is pure round-trip latency — measured 555 ms for 16
        # sequential np.asarray fetches through the tunnel vs one
        # latency's worth with the copies in flight.
        for _, scores, classes in pending:
            scores.copy_to_host_async()
            classes.copy_to_host_async()
        for chunk, scores, classes in pending:
            scores, classes = np.asarray(scores), np.asarray(classes)
            for row, i in enumerate(chunk):
                sample, n = encoded[i]
                raw = [sample["label"][k] for k in sorted(sample["label"])]
                page = self._annotate(raw, classes[row, :n], scores[row, :n])
                for processor in self.post_processors:
                    page = processor(page)
                outputs[i] = page
        # Single-page input: return the annotated page itself so outputs
        # align box-for-box with the caller's input list.
        return outputs[0] if single_page else outputs
