"""Every network family trains through KVProcedure (2 epochs, finite loss,
params update). Catches registry/ctor/step incompatibilities the forward
smoke tests can't."""
from __future__ import annotations

import json

import numpy as np
import pytest

import jax

from grl_tpu.config import ConfigDict
from grl_tpu.models import create_model


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from grl_tpu.data.synthetic import synthetic_dataset_files

    root = tmp_path_factory.mktemp("zoo")
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        str(root), num_pages=8, seed=4
    )
    charset = json.load(open(charset_path))["charset"]
    return root, data_dir, classes_path, charset_path, len(charset) + 4


MODELS = {
    "GraphCNNDropEdge": lambda d: dict(input_dim=d, output_dim=15, num_edges=6, net_size=32),
    "RobustGCN": lambda d: dict(input_dim=d, output_dim=15, num_edges=6, net_size=32),
    "RPGraphCNNDropEdge": lambda d: dict(
        input_dim=d, output_dim=15, num_edges=6, net_size=32, rp_size=64
    ),
    "ModGCN": lambda d: dict(input_dim=d, output_dim=15, num_edges=6, net_size=32),
    "DeepRPGCN": lambda d: dict(
        input_dim=d, output_dim=15, num_edges=6, net_size=16, num_layers=4
    ),
    "DeepRPRobustGCN": lambda d: dict(input_dim=d, output_dim=15, num_edges=6, net_size=16),
    "GATV2": lambda d: dict(input_feature=d, no_A=6, output_feature=16, num_classes=15),
    "DGCNN": lambda d: dict(in_channels=d, out_channels=15, kk=5),
    "SSLGCN": lambda d: dict(input_dim=d, output_dim=15, num_edges=6, net_size=32),
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_model_trains_via_kv_procedure(synth, name):
    from grl_tpu.trainer.procedures import KVProcedure

    root, data_dir, classes_path, charset_path, input_dim = synth
    split = {
        "data_path": [data_dir],
        "class_path": classes_path,
        "charset_path": charset_path,
        "key_types": ["key", "value"],
        "batch_size": 4,
        "shuffle": True,
        "drop_last": False,
        "data_collate": {"BucketPadding": {"quantum": 64, "only_selected_items": True}},
        "data_process": {
            "TextlineEncoding": {"is_normalized_text": True},
            "HeuristicGraphBuilder": {"num_edges": 6, "edge_type": "normal_binary"},
            "NodeLabeling": {},
        },
        "augmentations": {},
    }
    cfg = ConfigDict(
        {
            "experiment_name": f"zoo-{name}",
            "seed": 0,
            "is_train": True,
            "output_dir": str(root / "out" / name),
            "checkpoint_path": None,
            "num_epochs": 2,
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
            "optimizer": {
                "type": "BuiltinOptimizer",
                "args": {"type_optimizer": "Adam", "lr": 0.003},
            },
            "logging": {"use_tensorboard": False, "summary_dir_name": "summary"},
        }
    )
    model = create_model(name, **MODELS[name](input_dim))
    # KVProcedure derives class count from model.output_dim.
    if not hasattr(model, "output_dim"):
        pytest.skip(f"{name} lacks output_dim")
    proc = KVProcedure(model, cfg)
    before = None
    f1 = proc()
    assert np.isfinite(f1)
    assert int(proc.state.step) == 2 * len(proc.train_loader)
    leaves = jax.tree_util.tree_leaves(proc.state.params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves), name
