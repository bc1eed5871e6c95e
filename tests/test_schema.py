"""I/O contract tests: inference inputs/outputs validate against the JSON
schemas (the reference's only working test idea — reference:
tests/test_schema.py:79-96, tests/assets/schemas/*). Runs the REAL
inference path on a trained tiny model, not fixture files."""
from __future__ import annotations

import json
import os

import pytest

jsonschema = pytest.importorskip("jsonschema")

ASSETS = os.path.join(os.path.dirname(__file__), "assets", "schemas")


def load_schema(name: str):
    with open(os.path.join(ASSETS, name), encoding="utf-8") as handle:
        return json.load(handle)


@pytest.fixture(scope="module")
def sample_page():
    from grl_tpu.data.synthetic import synthetic_page

    page = synthetic_page(123)
    return [{"location": line["location"], "text": line["text"]} for line in page]


class TestSchemas:
    def test_input_schema_accepts_cassia_page(self, sample_page):
        jsonschema.validate(sample_page, load_schema("input_schema.json"))

    def test_input_schema_rejects_missing_text(self):
        bad = [{"location": [[0, 0], [1, 0], [1, 1], [0, 1]]}]
        with pytest.raises(jsonschema.ValidationError):
            jsonschema.validate(bad, load_schema("input_schema.json"))

    def test_inference_output_matches_schema(self, tmp_path, sample_page):
        """End-to-end: tiny training run -> predict -> validate output."""
        from grl_tpu.config import ConfigDict
        from grl_tpu.data.synthetic import synthetic_dataset_files
        from grl_tpu.models import GraphCNNDropEdge
        from grl_tpu.warper import GNNLearningWarper

        data_dir, classes_path, charset_path = synthetic_dataset_files(
            str(tmp_path), num_pages=4, seed=2
        )
        charset = json.load(open(charset_path))["charset"]
        split = {
            "data_path": [data_dir],
            "class_path": classes_path,
            "charset_path": charset_path,
            "key_types": ["key", "value"],
            "batch_size": 4,
            "shuffle": False,
            "drop_last": False,
            "data_collate": {"BucketPadding": {"quantum": 64, "only_selected_items": True}},
            "data_process": {
                "TextlineEncoding": {"is_normalized_text": True},
                "HeuristicGraphBuilder": {"num_edges": 6, "edge_type": "normal_binary"},
                "NodeLabeling": {},
            },
            "augmentations": {},
        }
        config = ConfigDict(
            {
                "experiment_name": "schema-test",
                "seed": 0,
                "is_train": True,
                "output_dir": str(tmp_path / "out"),
                "checkpoint_path": None,
                "num_epochs": 1,
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
                "optimizer": {
                    "type": "BuiltinOptimizer",
                    "args": {"type_optimizer": "Adam", "lr": 0.005},
                },
                "logging": {"use_tensorboard": False, "summary_dir_name": "summary"},
            }
        )
        model = GraphCNNDropEdge(
            input_dim=len(charset) + 4, output_dim=15, num_edges=6, net_size=32
        )
        warper = GNNLearningWarper(model, config=config)
        warper.train()

        infer_cfg = config.copy()
        infer_cfg["is_train"] = False
        infer_cfg["checkpoint_path"] = str(
            tmp_path / "out" / "schema-test" / "models" / "model_latest"
        )
        infer_cfg["procedure"] = {"type": "KVInference", "args": {"batch_size": 4}}
        infer_cfg["inference_settings"] = {
            "datasets": {"type": "CassiaDataset", "args": dict(split)}
        }
        predictor = GNNLearningWarper(model, config=infer_cfg)
        from grl_tpu.data.synthetic import synthetic_page

        page = [
            {"location": line["location"], "text": line["text"]}
            for line in synthetic_page(55)
        ]
        outputs = predictor.predict([page])
        jsonschema.validate(outputs[0], load_schema("output_schema.json"))
