"""Base training procedure: state, jitted steps, registries, checkpoints.

The TPU-native counterpart of the reference BaseProcedure (reference:
gnn/trainer/training_procedures/base_procedure.py:15-197). Instead of a
mutable torch module moved ``.to(device)`` with eager per-op dispatch, the
whole optimization step — forward, loss, backward, clip, update, metric
counts — is one jitted function over an explicit ``TrainState`` pytree
with donated buffers. Device selection, DDP wrapping and NCCL setup
(reference: base_procedure.py:54-93) are replaced by an optional
``jax.sharding.Mesh``: params replicate, the batch shards over the
``data`` axis, and XLA inserts the gradient ``psum`` over ICI.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from grl_tpu.config import ConfigDict, instantiate
from grl_tpu.models.base import count_parameters, init_model
from grl_tpu.trainer import losses as losses_module
from grl_tpu.trainer import lr_schedulers as lr_module
from grl_tpu.trainer import optimizers as optim_module
from grl_tpu.trainer.metrics import confusion_matrix
from grl_tpu.utils.checkpoint import CheckpointHandler
from grl_tpu.utils.logging import get_logger
from grl_tpu.utils.tensorboard import MetricsWriter


class TrainState(flax.struct.PyTreeNode):
    params: Any
    constants: Any
    batch_stats: Any  # None for models without BatchNorm
    opt_state: Any
    step: jnp.ndarray

    def variables(self) -> Dict[str, Any]:
        out = {"params": self.params}
        if self.constants is not None:
            out["constants"] = self.constants
        if self.batch_stats is not None:
            out["batch_stats"] = self.batch_stats
        return out


class BaseProcedure:
    """Shared setup: output dirs, criterion/optimizer/scheduler registries,
    checkpoint restore, jitted train/eval step factories."""

    def __init__(self, model: Any, config: ConfigDict,
                 ems_exp: Optional[Any] = None, **kwargs: Any):
        self.logger = get_logger(self.__class__.__name__)
        self.config = ConfigDict(config)
        self.model = model
        # Experiment-tracking run with a Neptune-shaped append API
        # (reference: base_procedure.py:15-21 receives ems_exp; series
        # appended throughout kv_procedure.py:196-251).
        self.ems_exp = ems_exp
        self.model_dir = os.path.join(
            self.config.get("output_dir", "./outputs"),
            self.config.get("model_dir_name", "models"),
        )
        os.makedirs(self.model_dir, exist_ok=True)
        self.checkpointer = CheckpointHandler()

        self.seed = int(self.config.get("seed", 0))
        # config rng_impl: "rbg" selects the TPU-native hardware PRNG for
        # every stream this procedure derives (dropout/DropEdge masks).
        # threefry (the jax default) generates a (169k, 1280) dropout
        # mask in software — measured ~13 ms/step at arxiv scale, ~18%
        # of the whole full-graph train step; rbg is near-free. Still
        # deterministic per seed; the streams differ from threefry's, so
        # fixed-seed runs change ONCE when flipping this knob. The impl
        # rides the ROOT KEY (every split inherits it) rather than the
        # global jax config, so one procedure's choice cannot leak into
        # other procedures/tests in the same process.
        rng_impl = self.config.get("rng_impl")
        if rng_impl:
            # TYPED key: raw uint32 keys do not carry their impl (they
            # are re-interpreted under the global default at every
            # split), typed keys do.
            self.rng = jax.random.key(self.seed, impl=str(rng_impl))
        else:
            self.rng = jax.random.PRNGKey(self.seed)

        self.criterion = self._init_criterion()
        self.optimizer_factory = self._init_optimizer()
        self.lr_scheduler = self._init_lr_scheduler()
        self.tx = self.optimizer_factory.make(self.config.get("max_grad_norm"))

        summary_dir = os.path.join(
            self.config.get("output_dir", "./outputs"),
            self.config.get_path("logging.summary_dir_name", "summary"),
        )
        self.tb_writer = MetricsWriter(
            summary_dir,
            enable_tensorboard=bool(self.config.get_path("logging.use_tensorboard", True)),
        )
        self.state: Optional[TrainState] = None
        self._train_step_fn: Optional[Callable] = None
        self._eval_step_fn: Optional[Callable] = None
        # SPMD mesh from ``config.parallel.mesh`` (replaces the reference's
        # DDP/DataParallel wrapping — reference: base_procedure.py:79-93):
        # params are placed by tensor-parallel rules, the batch shards over
        # the ``data`` axis, and XLA inserts the gradient reductions.
        self.mesh = self._init_mesh()

    def _init_mesh(self):
        spec = self.config.get_path("parallel.mesh")
        if not spec:
            return None
        from grl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh({k: int(v) for k, v in dict(spec).items()})
        if int(np.prod(list(mesh.shape.values()))) <= 1:
            return None  # single device: plain jit is the fast path
        self.logger.info(
            f"SPMD mesh over {len(mesh.devices.flat)} devices: {dict(mesh.shape)}"
        )
        return mesh

    @classmethod
    def _from_config(cls, model: Any, config: ConfigDict, **kwargs: Any) -> "BaseProcedure":
        return cls(model, config, **kwargs)

    # ------------------------------------------------------------------
    # Registry init (reference: base_procedure.py:95-138)
    # ------------------------------------------------------------------
    def _init_criterion(self):
        spec = self.config.get("loss", {"type": "CrossEntropyLoss", "args": {}})
        criterion = instantiate(losses_module, spec)
        self.logger.info(f"Loss type: {criterion.__class__.__name__}")
        return criterion

    def _init_optimizer(self):
        spec = self.config.get(
            "optimizer",
            {"type": "BuiltinOptimizer", "args": {"type_optimizer": "Adam", "lr": 1e-3}},
        )
        optimizer = instantiate(optim_module, spec)
        self.logger.info(f"Optimizer type: {optimizer.type_optimizer}")
        return optimizer

    def _init_lr_scheduler(self):
        spec = self.config.get("lr_scheduler")
        if not spec or not spec.get("type"):
            return lr_module.ConstantLearningRate(self.optimizer_factory.learning_rate)
        scheduler = instantiate(lr_module, spec)
        self.logger.info(f"LR scheduler type: {scheduler.__class__.__name__}")
        return scheduler

    # ------------------------------------------------------------------
    # State lifecycle
    # ------------------------------------------------------------------
    def init_state(self, example_inputs: Tuple[jnp.ndarray, ...]) -> TrainState:
        variables = init_model(self.model, self.rng, example_inputs, train=False)
        params = variables["params"]
        constants = variables.get("constants")
        batch_stats = variables.get("batch_stats")
        self.logger.info(
            f"Num parameters of {self.model.__class__.__name__}: "
            f"{count_parameters(params):,}"
        )
        if self.mesh is not None:
            from grl_tpu.parallel.mesh import replicate, shard_params

            # TP placement for wide projections; everything else replicates.
            # The optimizer state inherits each param's sharding because
            # zeros_like/eager init follow input placement.
            params = shard_params(params, self.mesh)
            if constants is not None:
                constants = shard_params(constants, self.mesh)
            if batch_stats is not None:
                batch_stats = replicate(batch_stats, self.mesh)
        state = TrainState(
            params=params,
            constants=constants,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        state = self._load_prev_checkpoint(state)
        self.state = state
        return state

    def _load_prev_checkpoint(self, state: TrainState) -> TrainState:
        path = self.config.get("checkpoint_path")
        if not path and self.config.get("resume", False):
            # Preemption-safe auto-resume from this run's latest step
            # checkpoint (full state incl. optimizer + step; the reference
            # could only reload weights and restarted optimization).
            candidate = os.path.join(self.model_dir, "model_latest")
            if os.path.exists(candidate):
                path = candidate
        if path:
            self.logger.info("Restoring pretrained checkpoint ...")
            state = self.checkpointer.restore_checkpoint(path, target=state)
            self.logger.info("Loading pretrained model success!")
        return state

    def _update_learning_rate(self, epoch: int, step: int) -> float:
        """Per-epoch LR write into the injected hyperparam (reference:
        base_procedure.py:172-185)."""
        lr = self.lr_scheduler._step_lr(epoch, step)
        self.state = self.state.replace(
            opt_state=optim_module.set_learning_rate(self.state.opt_state, lr)
        )
        return lr

    # ------------------------------------------------------------------
    # Batch placement
    # ------------------------------------------------------------------
    def place_batch(self, arrays: Dict[str, np.ndarray],
                    pad_values: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Device-place a host batch; under a mesh, pad the batch dim to a
        multiple of the ``data`` axis and shard it (the DistributedSampler
        + per-rank batch split analog — reference: base_dataloader.py:90-107).

        ``pad_values`` supplies the fill for the pad rows (e.g. -100 for
        labels so the loss/metrics masks drop them — numerics identical to
        the unpadded batch).
        """
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in arrays.items()}
        from grl_tpu.parallel.mesh import shard_batch

        d = int(self.mesh.shape.get("data", 1))
        B = next(iter(arrays.values())).shape[0]
        pad = (-B) % d
        if pad:
            pad_values = pad_values or {}
            arrays = {
                k: np.concatenate(
                    [v, np.full((pad, *v.shape[1:]), pad_values.get(k, 0), v.dtype)]
                )
                for k, v in arrays.items()
            }
        return shard_batch(arrays, self.mesh)

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------
    def _apply_kwargs(self) -> Dict[str, Any]:
        """Extra kwargs forwarded to model.apply each step (overridable)."""
        return {}

    def build_train_step(self, num_classes: int, ignore_values: Tuple[int, ...]):
        return partial(jax.jit, donate_argnums=(0,))(
            self._train_step_body(num_classes, ignore_values)
        )

    def build_scanned_train_step(
        self, num_classes: int, ignore_values: Tuple[int, ...]
    ):
        """K fused optimizer steps per dispatch: ``lax.scan`` of the train
        step body over stacked ``(K, ...)`` batches (+ per-step rng/lam).

        Per-step dispatch pays a host round-trip between steps that can
        exceed the device step itself (measured ~1.7 ms overhead vs a
        ~1.2 ms flagship device step through the TPU tunnel —
        docs/model-performance.md); fusing K same-shape batches amortizes
        it to 1/K. Returns ``(state, losses (K,), cms (K, C, C))``.
        """
        body = self._train_step_body(num_classes, ignore_values)

        @partial(jax.jit, donate_argnums=(0,))
        def scanned(state: TrainState, Vs, As, labels_s, rngs, lams):
            def f(st, xs):
                st, loss, cm = body(st, *xs)
                return st, (loss, cm)

            state, (losses, cms) = jax.lax.scan(
                f, state, (Vs, As, labels_s, rngs, lams)
            )
            return state, losses, cms

        return scanned

    def _train_step_body(self, num_classes: int, ignore_values: Tuple[int, ...]):
        model, criterion = self.model, self.criterion
        tx = self.tx
        has_bn = self.state is not None and self.state.batch_stats is not None

        def train_step(state: TrainState, V, A, labels, rng, lam):
            def loss_fn(params):
                variables = {"params": params}
                if state.constants is not None:
                    variables["constants"] = state.constants
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                    logits, mutated = model.apply(
                        variables, (V, A), train=True, lambda_value=lam,
                        rngs={"dropout": rng}, mutable=["batch_stats"],
                    )
                    new_bn = mutated["batch_stats"]
                else:
                    logits = model.apply(
                        variables, (V, A), train=True, lambda_value=lam,
                        rngs={"dropout": rng},
                    )
                    new_bn = None
                if logits.ndim == labels.ndim:
                    # Sparse path: flat (B*N, C) logits -> (B, N, C).
                    logits = logits.reshape(*labels.shape, -1)
                return criterion(logits, labels), (logits, new_bn)

            (loss, (logits, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(preds, labels, num_classes, ignore_values)
            new_state = state.replace(
                params=new_params,
                batch_stats=new_bn if has_bn else state.batch_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            )
            return new_state, loss, cm

        return train_step

    def build_eval_step(self, num_classes: int, ignore_values: Tuple[int, ...]):
        model, criterion = self.model, self.criterion

        @jax.jit
        def eval_step(state: TrainState, V, A, labels, lam):
            logits = model.apply(
                state.variables(), (V, A), train=False, lambda_value=lam
            )
            if logits.ndim == labels.ndim:
                logits = logits.reshape(*labels.shape, -1)
            loss = criterion(logits, labels)
            preds = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(preds, labels, num_classes, ignore_values)
            return loss, cm, preds

        return eval_step

    # ------------------------------------------------------------------
    def _init_dataloaders(self):
        raise NotImplementedError

    def __call__(self):
        raise NotImplementedError
