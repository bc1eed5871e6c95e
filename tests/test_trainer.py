"""Trainer tests: loss parity vs torch, metric parity vs sklearn, and an
end-to-end KVProcedure training run on synthetic data (state-contract
tests modeled on the reference test templates —
reference: tests/test_training.py:126-164,210-346)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestLossParity:
    def _logits_targets(self, seed=0, B=4, N=17, C=9):
        rng = np.random.RandomState(seed)
        logits = rng.randn(B, N, C).astype(np.float32)
        targets = rng.randint(0, C, size=(B, N))
        targets[rng.rand(B, N) < 0.3] = -100
        return logits, targets

    def test_cross_entropy_matches_torch(self):
        torch = pytest.importorskip("torch")
        from grl_tpu.trainer.losses import cross_entropy

        logits, targets = self._logits_targets()
        ref = torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits).transpose(1, 2), torch.from_numpy(targets)
        ).item()
        mine = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
        assert abs(ref - mine) < 1e-5

    def test_weighted_cross_entropy_matches_torch(self):
        torch = pytest.importorskip("torch")
        from grl_tpu.trainer.losses import cross_entropy

        logits, targets = self._logits_targets(seed=1)
        weight = np.linspace(0.5, 2.0, logits.shape[-1]).astype(np.float32)
        ref = torch.nn.CrossEntropyLoss(torch.from_numpy(weight))(
            torch.from_numpy(logits).transpose(1, 2), torch.from_numpy(targets)
        ).item()
        mine = float(
            cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weight))
        )
        assert abs(ref - mine) < 1e-5

    def test_focal_matches_torch_formula(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from grl_tpu.trainer.losses import focal_loss

        logits, targets = self._logits_targets(seed=2)
        pred = torch.from_numpy(logits).transpose(1, 2)
        logpt = F.log_softmax(pred, dim=1)
        pt = torch.exp(logpt)
        ref = F.nll_loss((1 - pt) ** 2.0 * logpt, torch.from_numpy(targets)).item()
        mine = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=2.0))
        assert abs(ref - mine) < 1e-5

    def test_bce_and_mse_masking(self):
        torch = pytest.importorskip("torch")
        from grl_tpu.trainer.losses import binary_cross_entropy_with_logits, masked_mse

        rng = np.random.RandomState(3)
        logits = rng.randn(4, 10).astype(np.float32)
        targets = (rng.rand(4, 10) > 0.5).astype(np.float32)
        targets[rng.rand(4, 10) < 0.2] = -100.0
        mask = torch.from_numpy(targets) != -100
        raw = torch.nn.BCEWithLogitsLoss(reduction="none")(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
        ref = ((raw * mask).sum() / mask.sum()).item()
        mine = float(
            binary_cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(targets))
        )
        assert abs(ref - mine) < 1e-4

        mse_ref = (
            ((torch.from_numpy(logits) - torch.from_numpy(targets)) * mask) ** 2
        ).sum().item() / mask.sum().item()
        mse_mine = float(masked_mse(jnp.asarray(logits), jnp.asarray(targets)))
        assert abs(mse_ref - mse_mine) < 1e-3


class TestMetricsParity:
    def test_macro_scores_match_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        from grl_tpu.trainer.metrics import confusion_matrix, macro_scores

        rng = np.random.RandomState(0)
        C = 11
        targets = rng.randint(0, C, size=(500,))
        preds = rng.randint(0, C, size=(500,))
        targets[rng.rand(500) < 0.2] = -100
        sel = targets != -100
        report = sk.classification_report(
            targets[sel], preds[sel], output_dict=True, zero_division=0
        )["macro avg"]
        cm = confusion_matrix(
            jnp.asarray(preds), jnp.asarray(targets), C, ignore_values=(-100,)
        )
        mine = macro_scores(np.asarray(cm))
        for key_sk, key_mine in (
            ("precision", "precision"),
            ("recall", "recall"),
            ("f1-score", "f1-score"),
            ("support", "support"),
        ):
            assert abs(report[key_sk] - mine[key_mine]) < 1e-9, key_sk

    def test_other_class_exclusion(self):
        from grl_tpu.trainer.metrics import confusion_matrix

        targets = jnp.asarray([0, 1, 2, -100])
        preds = jnp.asarray([0, 1, 2, 2])
        cm = np.asarray(confusion_matrix(preds, targets, 3, ignore_values=(-100, 0)))
        assert cm.sum() == 2  # entries with target 0 and -100 dropped


@pytest.fixture(scope="module")
def synthetic_config(tmp_path_factory):
    from grl_tpu.data.synthetic import synthetic_dataset_files

    root = tmp_path_factory.mktemp("synth")
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        str(root), num_pages=16, seed=0
    )
    split = {
        "data_path": [data_dir],
        "class_path": classes_path,
        "charset_path": charset_path,
        "key_types": ["key", "value"],
        "batch_size": 8,
        "shuffle": True,
        "drop_last": False,
        "data_collate": {
            "BucketPadding": {"quantum": 64, "only_selected_items": True}
        },
        "data_process": {
            "TextlineEncoding": {"is_normalized_text": True},
            "HeuristicGraphBuilder": {"num_edges": 6, "edge_type": "normal_binary"},
            "NodeLabeling": {},
        },
        "augmentations": {},
    }
    return {
        "experiment_name": "synthetic-kv",
        "seed": 0,
        "is_train": True,
        "output_dir": str(root / "outputs"),
        "checkpoint_path": None,
        "num_epochs": 30,
        "max_grad_norm": 5.0,
        "model_dir_name": "models",
        "data_config": {
            "dataset": {
                "type": "CassiaDataset",
                "args": {"node_label_padding_value": -100, "other_class_index": None},
            },
            "training": dict(split),
            "validation": dict(split),
        },
        "procedure": {"type": "KVProcedure", "args": {}},
        "loss": {"type": "CrossEntropyLoss", "args": {}},
        "lr_scheduler": {
            "type": "DecayLearningRate",
            "args": {"lr": 0.01, "factor": 0.9, "num_epochs": 60},
        },
        "optimizer": {
            "type": "BuiltinOptimizer",
            "args": {"type_optimizer": "Adam", "lr": 0.01},
        },
        "logging": {"use_tensorboard": False, "summary_dir_name": "summary"},
    }


class TestKVProcedureEndToEnd:
    def test_training_learns_and_checkpoints(self, synthetic_config):
        import os

        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.warper import GNNLearningWarper

        # input_dim = charset + 4 bbox features.
        import json

        charset = json.load(
            open(synthetic_config["data_config"]["training"]["charset_path"])
        )["charset"]
        model = GraphCNNDropEdge(
            input_dim=len(charset) + 4,
            output_dim=15,  # 7 classes * 2 key types + 1 background
            num_edges=6,
            net_size=64,
        )
        warper = GNNLearningWarper(model, config=synthetic_config)
        f1 = warper.train()

        # Params changed after fit (reference contract:
        # tests/test_training.py:126-143).
        assert warper.trainer.state is not None
        assert int(warper.trainer.state.step) > 0
        assert 0.0 <= f1 <= 1.0
        model_dir = warper.trainer.model_dir
        assert any(
            name.startswith("model_latest") for name in os.listdir(model_dir)
        ), os.listdir(model_dir)
        # Training on fully learnable synthetic data: F1 must be well above
        # chance after 30 epochs.
        assert f1 > 0.25, f"F1 too low: {f1}"

        # Experiment-tracking series written (reference channel parity:
        # kv_procedure.py:196-251 appends Train/step_loss, Train/*,
        # Validation/*, Macro Validation/*, RP/Lambda).
        series_path = os.path.join(
            warper.config["output_dir"], "experiment_series.jsonl"
        )
        assert os.path.exists(series_path)
        paths = {json.loads(line)["path"] for line in open(series_path)}
        assert "Train/step_loss" in paths
        assert "RP/Lambda" in paths
        assert any(p.startswith("Validation/") for p in paths)
        assert any(p.startswith("Macro Validation/") for p in paths)

    def test_checkpoint_restore_roundtrip(self, synthetic_config):
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import KVProcedure
        from grl_tpu.config import ConfigDict
        import json
        import os

        charset = json.load(
            open(synthetic_config["data_config"]["training"]["charset_path"])
        )["charset"]
        model = GraphCNNDropEdge(
            input_dim=len(charset) + 4, output_dim=15, num_edges=6, net_size=64
        )
        cfg = ConfigDict(synthetic_config)
        cfg["num_epochs"] = 1
        cfg["output_dir"] = cfg["output_dir"] + "-restore"
        proc = KVProcedure(model, cfg)
        proc()
        ckpt = os.path.join(proc.model_dir, "model_latest")
        assert os.path.exists(ckpt)

        cfg2 = cfg.copy()
        cfg2["checkpoint_path"] = ckpt
        proc2 = KVProcedure(model, cfg2)
        batch = next(iter(proc2.train_loader))
        proc2._ensure_initialized(batch)
        # Restored state matches saved params exactly.
        old = jax.tree_util.tree_leaves(proc.state.params)
        new = jax.tree_util.tree_leaves(proc2.state.params)
        for a, b in zip(old, new):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Optimizer state is restored too (the reference never saved it).
        assert int(proc2.state.step) == int(proc.state.step)
