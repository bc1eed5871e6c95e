"""Joint supervised + self-supervised multi-task training.

Re-design of the reference JointTrainingProcedure (reference: gnn/trainer/
training_procedures/joint_training_procedure.py:17-303): a supervised KV
loss plus auxiliary SSL losses from a second dataloader; iterators
interleave with wrap-around so the epoch length is the longer loader; the
supervised + SSL losses backprop jointly in one jitted step.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grl_tpu.config import ConfigDict
from grl_tpu.data.dataloader import BaseDataLoader
from grl_tpu.trainer import losses
from grl_tpu.trainer.metrics import confusion_matrix
from grl_tpu.trainer.procedures.base_procedure import TrainState
from grl_tpu.trainer.procedures.kv_procedure import KVProcedure

JOINT_CRITERIONS = {
    "node_property": losses.masked_mse,
    "edge_mask": losses.binary_cross_entropy_with_logits,
    "pairwise_distance": losses.cross_entropy,
    "pairwise_similarity": losses.masked_mse,
}


class JointTrainingProcedure(KVProcedure):
    def __init__(self, model: Any, config: ConfigDict, tasks: List[str], **kwargs: Any):
        super().__init__(model, config, **kwargs)
        self.tasks = list(tasks)
        self.ssl_train_loader, self.ssl_val_loader = self._init_ssl_dataloaders()
        self._ssl_iter = None
        self._joint_fn = None

    def _init_ssl_dataloaders(self):
        factory = BaseDataLoader(self.config)
        dataset_type = self.config.get_path("data_config.dataset.type", "DatapileDataset")
        loaders = []
        for split in ("ssl_training", "ssl_validation"):
            split_cfg = self.config.get_path(f"data_config.{split}")
            if split_cfg is None:
                loaders.append(None)
                continue
            ds = factory._load_dataset(dataset_type, split_cfg, data_type=split)
            loaders.append(factory._get_dataloader(ds, split_cfg))
        return loaders

    def _next_ssl_batch(self) -> Optional[Dict[str, Any]]:
        if self.ssl_train_loader is None:
            return None
        if self._ssl_iter is None:
            self._ssl_iter = iter(self.ssl_train_loader)
        try:
            return next(self._ssl_iter)
        except StopIteration:
            self._ssl_iter = iter(self.ssl_train_loader)
            return next(self._ssl_iter)

    def _ssl_arrays(self, batch: Optional[Dict[str, Any]]) -> Optional[Dict[str, jnp.ndarray]]:
        if batch is None:
            return None
        keys = {"textline_encoding", "adjacency_matrix"}
        for task in self.tasks:
            if task == "node_property":
                keys.add("node_property")
            else:
                keys.update({f"{task}_indices", f"{task}_targets"})
        out = {}
        for key in keys:
            if key in batch:
                value = np.asarray(batch[key])
                if value.dtype in (np.float16, np.float64):
                    value = value.astype(np.float32)
                out[key] = jnp.asarray(value)
        return out

    def _build_joint_train_step(self):
        model, criterion, tasks, tx = self.model, self.criterion, self.tasks, self.tx
        num_classes, ignore = self.num_classes, self._ignore

        @partial(jax.jit, donate_argnums=(0,), static_argnames=("with_ssl",))
        def train_step(state: TrainState, V, A, labels, ssl_data, rng, with_ssl):
            def loss_fn(params):
                variables = {"params": params}
                if state.constants is not None:
                    variables["constants"] = state.constants
                rngs = jax.random.split(rng, len(tasks) + 1)
                logits = model.apply(
                    variables, (V, A), train=True, rngs={"dropout": rngs[-1]}
                )
                total = criterion(logits, labels)
                if with_ssl:
                    sv = ssl_data["textline_encoding"]
                    sa = ssl_data["adjacency_matrix"]
                    for i, task in enumerate(tasks):
                        kwargs = {"task": task}
                        if task != "node_property":
                            kwargs["edges"] = ssl_data[f"{task}_indices"].astype(jnp.int32)
                        pred = model.apply(
                            variables, (sv, sa), train=True,
                            rngs={"dropout": rngs[i]}, **kwargs,
                        )
                        target_key = (
                            task if task == "node_property" else f"{task}_targets"
                        )
                        target = ssl_data[target_key]
                        target = (
                            target.astype(jnp.int32)
                            if task == "pairwise_distance"
                            else target.astype(jnp.float32)
                        )
                        total += JOINT_CRITERIONS[task](pred, target)
                return total, logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(preds, labels, num_classes, ignore)
            return (
                state.replace(
                    params=optax.apply_updates(state.params, updates),
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                loss,
                cm,
            )

        return train_step

    def _run_train_batch(self, batch, epoch):
        self._ensure_initialized(batch)
        if self._joint_fn is None:
            self._joint_fn = self._build_joint_train_step()
        V, A, labels = self._prepare_batch(batch)
        ssl_data = self._ssl_arrays(self._next_ssl_batch())
        self._lambda_value(epoch)
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, loss, cm = self._joint_fn(
            self.state, V, A, labels, ssl_data or {}, step_rng,
            with_ssl=ssl_data is not None,
        )
        return self._scores_from_cm(np.asarray(cm), float(loss))
