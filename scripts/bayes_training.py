#!/usr/bin/env python
"""Bayesian hyperparameter search over the RanPAC lambda value.

Mirror of the reference entry (reference: scripts/bayes_training.py:10-59)
using the built-in GP optimizer (:mod:`grl_tpu.utils.bayes_opt`) instead
of the external ``bayes_opt`` package.

Usage:
    python scripts/bayes_training.py --config configs/synthetic_kv.yaml \
        --init-points 5 --n-iter 15 --rp-size 128
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="Bayesian lambda search")
    parser.add_argument("--config", required=True)
    parser.add_argument("--init-points", type=int, default=5)
    parser.add_argument("--n-iter", type=int, default=15)
    parser.add_argument("--rp-size", type=int, default=128)
    args = parser.parse_args()

    from demo_training import maybe_generate_synthetic

    from grl_tpu.config import load_config
    from grl_tpu.models import RPGraphCNNDropEdge
    from grl_tpu.utils.bayes_opt import BayesianOptimization
    from grl_tpu.warper import GNNLearningWarper

    base_config = maybe_generate_synthetic(load_config(args.config))

    def objective(lambda_value: float) -> float:
        config = base_config.copy()
        config["experiment_name"] = (
            f"{config['experiment_name']}-bayes-lambda-{lambda_value:.4f}"
        )
        model_args = dict(config.model.args)
        model = RPGraphCNNDropEdge(
            input_dim=int(model_args["input_dim"]),
            output_dim=int(model_args["output_dim"]),
            num_edges=int(model_args["num_edges"]),
            net_size=int(model_args.get("net_size", 256)),
            rp_size=args.rp_size,
            lambda_value=lambda_value,
        )
        warper = GNNLearningWarper(model, config=config)
        return warper.train()

    optimizer = BayesianOptimization(
        f=objective, pbounds={"lambda_value": (0.0, 1.0)}, random_state=1234
    )
    optimizer.maximize(init_points=args.init_points, n_iter=args.n_iter)
    best = optimizer.max
    print(f"Best parameters: lambda={best['params']['lambda_value']:.4f} "
          f"f1={best['target']:.4f}")


if __name__ == "__main__":
    main()
