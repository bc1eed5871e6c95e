"""Op-level device-time breakdown of a training step on the real TPU.

Traces N dispatches of a configured procedure's train step with
jax.profiler and prints the top XLA ops by device time — the tool the
reference never had (its tensorboard_writer carries an unused
steps_per_sec counter; reference: gnn/utils/tensorboard_writer.py:60-68).
Works through the tunnel: the xplane's '/device:TPU:0' plane carries an
'XLA Ops' line (parse path: tensorflow.tsl.profiler.protobuf).

Usage:
    timeout 1500 python scripts/profile_step.py --config configs/arxiv_full_graph.yaml [--top 20]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def xla_op_breakdown(trace_dir: str) -> "collections.Counter":
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    tot: collections.Counter = collections.Counter()
    for path in glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            space.ParseFromString(fh.read())
        for plane in space.planes:
            if "TPU" not in plane.name or "#Chip" in plane.name:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    tot[meta.get(ev.metadata_id, "?")] += ev.duration_ps
    return tot


def main() -> int:
    parser = argparse.ArgumentParser(description="profile one train step")
    parser.add_argument("--config", required=True)
    parser.add_argument("--dispatches", type=int, default=2)
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args()

    import jax
    import numpy as np
    import yaml

    from bench import enable_compile_cache
    from grl_tpu.config import ConfigDict
    from grl_tpu.models import create_model
    from grl_tpu.trainer import procedures

    enable_compile_cache()
    cfg = ConfigDict(yaml.safe_load(open(args.config)))
    cfg["output_dir"] = tempfile.mkdtemp(prefix="grl_profile_")
    cfg["logging"] = {"use_tensorboard": False}
    model = create_model(cfg.model.type, **dict(cfg.model.args))
    proc = getattr(procedures, cfg.get_path("procedure.type", "FullGraphProcedure"))(
        model, cfg
    )
    if not hasattr(proc, "_ensure_initialized"):
        raise SystemExit("procedure has no _ensure_initialized hook")
    try:
        proc._ensure_initialized()
    except TypeError:
        raise SystemExit(
            "profile_step currently drives batchless procedures "
            "(FullGraphProcedure); for batched procedures use the "
            "logging.profile config window instead."
        )
    rng = jax.random.PRNGKey(0)
    state = proc.state
    rng, k = jax.random.split(rng)
    state, loss = proc._train_fn(state, proc.graph, proc.features, proc.train_labels, k)
    float(loss)  # compile + sync

    trace_dir = tempfile.mkdtemp(prefix="grl_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.dispatches):
        rng, k = jax.random.split(rng)
        state, loss = proc._train_fn(state, proc.graph, proc.features, proc.train_labels, k)
    float(loss)
    jax.profiler.stop_trace()

    tot = xla_op_breakdown(trace_dir)
    if not tot:
        print("no TPU 'XLA Ops' plane found in the trace", file=sys.stderr)
        return 1
    scan_k = max(1, int(cfg.get("scan_steps", 1)))
    steps = args.dispatches * scan_k
    # The outermost while (the scan) nests its children; report it
    # separately so percentages of the leaf ops are meaningful.
    leaf_total = sum(ps for name, ps in tot.items() if not name.startswith("%while"))
    print(f"device op time over {steps} steps "
          f"(leaf ops {leaf_total / 1e9 / steps:.2f} ms/step):")
    for name, ps in tot.most_common(args.top):
        tag = " [scan]" if name.startswith("%while") else ""
        print(
            f"  {ps / max(leaf_total, 1) * 100:5.1f}%  "
            f"{ps / 1e9 / steps:8.3f} ms/step  {name[:100]}{tag}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
