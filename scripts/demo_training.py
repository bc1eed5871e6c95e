#!/usr/bin/env python
"""Demo training entry point (reference: scripts/demo_training.py).

Usage:
    python scripts/demo_training.py --config configs/synthetic_kv.yaml

If the config carries a ``synthetic_data`` block with unset data paths, a
synthetic sumi-style dataset is generated first and the config is patched
in place (paths + model input_dim).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def maybe_generate_synthetic(config):
    if "synthetic_data" not in config:
        return config
    training = config.data_config.training
    if training.get("data_path"):
        return config
    import json

    from grl_tpu.data.synthetic import synthetic_dataset_files

    out_dir = os.path.join(config.get("output_dir", "./outputs"), "synthetic_data")
    num_pages = int(config.synthetic_data.get("num_pages", 64))
    data_dir, classes_path, charset_path = synthetic_dataset_files(
        out_dir, num_pages=num_pages, seed=int(config.get("seed", 0))
    )
    charset = json.load(open(charset_path))["charset"]
    for split in ("training", "validation"):
        split_cfg = config.data_config[split]
        split_cfg["data_path"] = [data_dir]
        split_cfg["class_path"] = classes_path
        split_cfg["charset_path"] = charset_path
    config.model.args["input_dim"] = len(charset) + 4
    return config


def main() -> None:
    parser = argparse.ArgumentParser(description="grl_tpu training")
    parser.add_argument("--config", required=True, help="Path to YAML config.")
    parser.add_argument("--platform", default=None, help="cpu|tpu (default: ambient)")
    parser.add_argument("--epochs", type=int, default=None, help="override num_epochs")
    args = parser.parse_args()

    from grl_tpu.utils.platform import ensure_platform

    ensure_platform(args.platform)

    from grl_tpu.config import load_config
    from grl_tpu.warper import GNNLearningWarper

    config = maybe_generate_synthetic(load_config(args.config))
    if args.epochs is not None:
        config["num_epochs"] = args.epochs
    warper = GNNLearningWarper(config=config)
    final_f1 = warper.train()
    print(f"final macro F1: {final_f1:.4f}")


if __name__ == "__main__":
    main()
