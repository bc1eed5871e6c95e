#!/usr/bin/env python
"""Demo inference entry point (reference: scripts/demo_inference.py).

Input: a cassia-format JSON file (or inline samples) of
``{"location": [[x,y]x4], "text": ...}`` boxes; output: the same boxes
annotated with ``key_type`` / ``formal_key`` / ``confidence``.

Usage:
    python scripts/demo_inference.py --config <cfg.yaml> --input page.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="grl_tpu inference")
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True, help="cassia-format JSON path")
    parser.add_argument("--output", default=None, help="where to write predictions")
    parser.add_argument("--platform", default=None, help="cpu|tpu (default: ambient)")
    args = parser.parse_args()

    from grl_tpu.utils.platform import ensure_platform

    ensure_platform(args.platform)

    from grl_tpu.config import load_config
    from grl_tpu.warper import GNNLearningWarper

    config = load_config(args.config)
    config["is_train"] = False
    charset_path = config.get_path("inference_settings.datasets.args.charset_path")
    if charset_path and not config.get_path("model.args.input_dim"):
        charset = json.load(open(charset_path, encoding="utf-8-sig"))["charset"]
        config.model.args["input_dim"] = len(charset) + 4
    warper = GNNLearningWarper(config=config)
    outputs = warper.predict(args.input)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as handle:
            json.dump(outputs, handle, ensure_ascii=False, indent=2)
        print(f"wrote {args.output}")
    else:
        print(json.dumps(outputs[:5], ensure_ascii=False, indent=2))


if __name__ == "__main__":
    main()
