"""Tests for the finetune / SSL-pretrain / joint / graph-classification
procedures on synthetic data."""
from __future__ import annotations

import json

import numpy as np
import pytest

import jax

from grl_tpu.config import ConfigDict


def make_split(data_dir, classes_path, charset_path, ssl=False):
    data_process = {
        "TextlineEncoding": {"is_normalized_text": True},
        "HeuristicGraphBuilder": {"num_edges": 6, "edge_type": "normal_binary"},
        "NodeLabeling": {},
    }
    extra_keys = {}
    collate = {"BucketPadding": {"quantum": 64, "only_selected_items": False}}
    if ssl:
        data_process.update(
            {
                "NodeDropAugmentor": {"drop_rate": 0.15, "seed": 0},
                "DGINegativeSampling": {"seed": 0},
                "SSLLabeling": {
                    "tasks": [
                        "node_property",
                        "edge_mask",
                        "pairwise_distance",
                        "graph_edit_distance",
                        "dgi",
                    ]
                },
            }
        )
        extra_keys = {
            "node_property": -100,
            "aug_textline_encoding": 0,
            "aug_adjacency_matrix": 0,
            "negative_textline_encoding": 0,
            "negative_adjacency_matrix": 0,
        }
        collate = {
            "BucketPadding": {
                "quantum": 64,
                "only_selected_items": True,
                "extra_keys": extra_keys,
                "keep_keys": [
                    "edge_mask_indices",
                    "edge_mask_targets",
                    "pairwise_distance_indices",
                    "pairwise_distance_targets",
                    "graph_edit_distance",
                    "dgi",
                ],
            },
            "NumpyPadding": {
                "name_value_pairs": {
                    "edge_mask_indices": 0,
                    "edge_mask_targets": -100,
                    "pairwise_distance_indices": 0,
                    "pairwise_distance_targets": -100,
                    "graph_edit_distance": -100,
                },
                "only_selected_items": False,
            },
        }
    return {
        "data_path": [data_dir],
        "class_path": classes_path,
        "charset_path": charset_path,
        "key_types": ["key", "value"],
        "batch_size": 4,
        "shuffle": True,
        "drop_last": False,
        "data_collate": collate,
        "data_process": data_process,
        "augmentations": {},
    }


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from grl_tpu.data.synthetic import synthetic_dataset_files

    root = tmp_path_factory.mktemp("proc")
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        str(root), num_pages=8, seed=1
    )
    charset = json.load(open(charset_path))["charset"]
    return root, data_dir, classes_path, charset_path, len(charset) + 4


def base_config(root, split, name, epochs=2):
    return ConfigDict(
        {
            "experiment_name": name,
            "seed": 0,
            "is_train": True,
            "output_dir": str(root / "out" / name),
            "checkpoint_path": None,
            "num_epochs": epochs,
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
            "loss": {"type": "CrossEntropyLoss", "args": {}},
            "lr_scheduler": {"type": "DecayLearningRate", "args": {"lr": 0.005}},
            "optimizer": {
                "type": "BuiltinOptimizer",
                "args": {"type_optimizer": "Adam", "lr": 0.005},
            },
            "logging": {"use_tensorboard": False, "summary_dir_name": "summary"},
        }
    )


class TestSSLPretrain:
    def test_multi_task_pretraining_runs(self, synth):
        root, data_dir, classes_path, charset_path, input_dim = synth
        from grl_tpu.models import SSLGCN
        from grl_tpu.trainer.procedures import SSLPretrainProcedure

        split = make_split(data_dir, classes_path, charset_path, ssl=True)
        cfg = base_config(root, split, "ssl-pretrain")
        model = SSLGCN(input_dim=input_dim, output_dim=15, num_edges=6, net_size=32)
        proc = SSLPretrainProcedure(
            model, cfg,
            tasks=["node_property", "edge_mask", "pairwise_distance",
                   "graph_edit_distance", "dgi"],
        )
        f1 = proc()
        assert np.isfinite(f1)
        assert int(proc.state.step) == 2 * len(proc.train_loader)
        # DGI discriminator params are in the train state.
        assert "discriminator" in proc.state.params

    def test_finetune_from_ssl_checkpoint(self, synth):
        root, data_dir, classes_path, charset_path, input_dim = synth
        from grl_tpu.models import GraphCNNDropEdge, SSLGCN
        from grl_tpu.trainer.procedures import SSLPretrainProcedure, FinetuneKVProcedure

        split = make_split(data_dir, classes_path, charset_path, ssl=True)
        cfg = base_config(root, split, "ssl-for-finetune", epochs=1)
        encoder = SSLGCN(input_dim=input_dim, output_dim=15, num_edges=6, net_size=32)
        pre = SSLPretrainProcedure(encoder, cfg, tasks=["node_property"])
        pre()
        ckpt = pre.model_dir + "/model_latest"

        ft_split = make_split(data_dir, classes_path, charset_path)
        ft_cfg = base_config(root, ft_split, "finetune", epochs=1)
        ft_cfg["optimize_settings"] = {"ssl_pretrain_path": ckpt}
        # New head size: backbone transfers, classifier stays fresh.
        model = GraphCNNDropEdge(input_dim=input_dim, output_dim=15, num_edges=6, net_size=32)
        proc = FinetuneKVProcedure(model, ft_cfg)
        batch = next(iter(proc.train_loader))
        proc._ensure_initialized(batch)
        pre_trunk = np.asarray(
            jax.tree_util.tree_leaves(pre.state.params["trunk"]["gcn1"])[0]
        )
        ft_trunk = np.asarray(
            jax.tree_util.tree_leaves(proc.state.params["trunk"]["gcn1"])[0]
        )
        np.testing.assert_array_equal(pre_trunk, ft_trunk)
        f1 = proc()
        assert np.isfinite(f1)


class TestJointTraining:
    def test_joint_supervised_plus_ssl(self, synth):
        root, data_dir, classes_path, charset_path, input_dim = synth
        from grl_tpu.models import SSLGCN
        from grl_tpu.trainer.procedures import JointTrainingProcedure

        split = make_split(data_dir, classes_path, charset_path)
        ssl_split = make_split(data_dir, classes_path, charset_path, ssl=True)
        cfg = base_config(root, split, "joint")
        cfg["data_config"]["ssl_training"] = ssl_split
        cfg["data_config"]["ssl_validation"] = ssl_split
        model = SSLGCN(input_dim=input_dim, output_dim=15, num_edges=6, net_size=32)
        proc = JointTrainingProcedure(
            model, cfg, tasks=["node_property", "edge_mask", "pairwise_distance"]
        )
        f1 = proc()
        assert np.isfinite(f1)
        assert int(proc.state.step) == 2 * len(proc.train_loader)


class TestGraphClassification:
    def test_graph_classification_procedure(self, synth, monkeypatch):
        root, data_dir, classes_path, charset_path, input_dim = synth
        from grl_tpu.data import processors as processors_module
        from grl_tpu.data.processors import BaseDataProcess
        from grl_tpu.models import SSLGCN
        from grl_tpu.trainer.procedures import GraphClassificationProcedure

        class SyntheticGraphLabel(BaseDataProcess):
            def __call__(self, sample):
                sample["graph_label"] = len(sample["label"]) % 3
                return sample

        monkeypatch.setattr(
            processors_module, "SyntheticGraphLabel", SyntheticGraphLabel, raising=False
        )
        split = make_split(data_dir, classes_path, charset_path)
        split["data_process"]["SyntheticGraphLabel"] = {}
        split["data_collate"]["BucketPadding"]["only_selected_items"] = False
        cfg = base_config(root, split, "graph-cls")
        cfg["procedure"] = {"type": "GraphClassificationProcedure",
                           "args": {"n_graph_classes": 3}}
        model = SSLGCN(input_dim=input_dim, output_dim=15, num_edges=6,
                       net_size=32, n_graph_classes=3)
        proc = GraphClassificationProcedure(model, cfg)
        f1 = proc()
        assert np.isfinite(f1)


class TestScannedKVDispatch:
    def test_scan_steps_fused_kv_training(self, synth):
        """scan_steps=K on KVProcedure: same-shape batches are fused into
        lax.scan dispatches; metrics/step counters advance identically to
        the per-step path and the run learns."""
        root, data_dir, classes_path, charset_path, input_dim = synth
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.trainer.procedures import KVProcedure

        split = make_split(data_dir, classes_path, charset_path)
        cfg = base_config(root, split, "kv-scan", epochs=2)
        cfg["scan_steps"] = 2
        model = GraphCNNDropEdge(
            input_dim=input_dim, output_dim=15, num_edges=6, net_size=32
        )
        proc = KVProcedure(model, cfg)
        f1 = proc()
        assert np.isfinite(f1)
        assert proc._scanned_dispatches > 0, "fused path never dispatched"
        assert int(proc.state.step) == proc.global_step
        assert proc.global_step == 2 * len(proc.train_loader)
