"""Serving-surface throughput: KVInference pages/s and boxes/s.

Times the PRODUCT predict path (GNNLearningWarper.predict ->
KVInference.__call__): host textline encoding + heuristic graph build +
bucket-batched cached-jit forward + post-processing, end to end, on
synthetic cassia-format pages. The reference's inference is eager torch
page-at-a-time (reference: gnn/trainer/inference_procedures/
kv_inference.py:113); this path batches same-bucket pages through one
compiled executable per bucket.

Usage: timeout 900 python scripts/bench_inference.py [--pages 64]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    pages = 64
    if "--pages" in sys.argv:
        pages = int(sys.argv[sys.argv.index("--pages") + 1])
    # --production-charset pads the synthetic charset to the reference's
    # master size (4365 chars -> input_dim 4369, net_size 256): the
    # synthetic charset alone (~60 chars) makes the forward so small the
    # device cannot matter, which hides the serving path's real
    # CPU-vs-TPU gap.
    production = "--production-charset" in sys.argv

    from grl_tpu.config import ConfigDict
    from grl_tpu.data.synthetic import synthetic_dataset_files, synthetic_page
    from grl_tpu.models import GraphCNNDropEdge
    from grl_tpu.warper import GNNLearningWarper

    tmp = tempfile.mkdtemp(prefix="grl_bench_infer_")
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        tmp, num_pages=8, seed=0
    )
    charset = json.load(open(charset_path))["charset"]
    if production:
        pad = [chr(0x4E00 + i) for i in range(4365 - len(charset))]
        charset = sorted(set(charset) | set(pad))
        charset_path = os.path.join(tmp, "charset_prod.json")
        with open(charset_path, "w") as fh:
            json.dump({"charset": charset}, fh)
    input_dim = len(charset) + 4

    # 1-epoch training to produce the checkpoint the inference path loads.
    train_cfg = ConfigDict(
        {
            "experiment_name": "bench-infer",
            "seed": 0,
            "is_train": True,
            "output_dir": tmp + "/out",
            "num_epochs": 1,
            "max_grad_norm": 5.0,
            "data_config": {
                "dataset": {
                    "type": "CassiaDataset",
                    "args": {"node_label_padding_value": -100,
                             "other_class_index": None},
                },
                "training": _split(data_dir, classes_path, charset_path),
                "validation": _split(data_dir, classes_path, charset_path),
            },
            "optimizer": {
                "type": "BuiltinOptimizer",
                "args": {"type_optimizer": "Adam", "lr": 0.005},
            },
            "logging": {"use_tensorboard": False},
        }
    )
    model = GraphCNNDropEdge(
        input_dim=input_dim, output_dim=15, num_edges=6,
        net_size=256 if production else 64,
    )
    GNNLearningWarper(model, config=train_cfg).train()

    infer_cfg = train_cfg.copy()
    infer_cfg["is_train"] = False
    # The warper nests output under experiment_name.
    infer_cfg["checkpoint_path"] = (
        tmp + "/out/bench-infer/models/model_latest"
    )
    infer_cfg["procedure"] = {"type": "KVInference", "args": {"batch_size": 8}}
    infer_cfg["inference_settings"] = {
        "datasets": {
            "type": "CassiaDataset",
            "args": {
                "charset_path": charset_path,
                "class_path": classes_path,
                "key_types": ["key", "value"],
                "data_process": {
                    "TextlineEncoding": {"is_normalized_text": True},
                    "HeuristicGraphBuilder": {
                        "num_edges": 6, "edge_type": "normal_binary"
                    },
                },
                "augmentations": {},
            },
        },
        "activation": {"type": "Softmax", "args": {"dim": 2}},
        "post_processing": [],
    }
    warper = GNNLearningWarper(model, config=infer_cfg)

    samples = [
        [
            {"location": box["location"], "text": box["text"]}
            for box in synthetic_page(seed=1000 + i)
        ]
        for i in range(pages)
    ]
    boxes = sum(len(s) for s in samples)
    warper.predict(samples[:8])  # warmup: compile the bucket executables
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        out = warper.predict(samples)
        best = min(best, time.perf_counter() - start)
    assert len(out) == pages
    print(
        json.dumps(
            {
                "metric": "kv_inference_throughput",
                "pages_per_s": round(pages / best, 2),
                "boxes_per_s": round(boxes / best, 1),
                "pages": pages,
                "boxes": boxes,
                "batch_size": 8,
                "input_dim": input_dim,
            }
        )
    )


def _split(data_dir, classes_path, charset_path):
    return {
        "data_path": [data_dir],
        "class_path": classes_path,
        "charset_path": charset_path,
        "key_types": ["key", "value"],
        "batch_size": 4,
        "shuffle": True,
        "drop_last": False,
        "data_collate": {
            "BucketPadding": {"quantum": 64, "only_selected_items": True}
        },
        "data_process": {
            "TextlineEncoding": {"is_normalized_text": True},
            "HeuristicGraphBuilder": {
                "num_edges": 6, "edge_type": "normal_binary"
            },
            "NodeLabeling": {},
        },
        "augmentations": {},
    }


if __name__ == "__main__":
    main()
