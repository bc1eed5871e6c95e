"""Multi-host (DCN) scaffolding: jax.distributed init + per-host data
sharding, proven with REAL 2-process CPU runs (subprocesses coordinate
through jax's distributed runtime with gloo CPU collectives).

Reference anchor: the NCCL DDP stack this replaces — init_process_group
(gnn/cl_warper.py:73-75) + DistributedSampler per-rank batch split
(gnn/data_generator/base_dataloader.py:90-95).
"""
from __future__ import annotations

import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ[%(coord)r] = f"127.0.0.1:{port}"
    os.environ[%(nproc)r] = str(nproc)
    os.environ[%(pid)r] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %(repo)r)
    from grl_tpu.config import ConfigDict
    from grl_tpu.parallel.distributed import initialize_distributed

    cfg = ConfigDict({"seed": 0})
    host_id, num_hosts = initialize_distributed(cfg)
    assert (host_id, num_hosts) == (pid, nproc), (host_id, num_hosts)
    assert cfg["host_id"] == pid and cfg["num_hosts"] == nproc

    # Per-host batch shard: each host sees a disjoint slice of the
    # global batch, together covering it exactly.
    from grl_tpu.data.dataloader import DataLoader

    class Toy:
        def __len__(self):
            return 12
        def __getitem__(self, i):
            import numpy as np
            return {"x": np.full((2,), i, np.float32)}

    loader = DataLoader(Toy(), batch_size=4, shuffle=True, seed=0,
                        host_id=cfg["host_id"], num_hosts=cfg["num_hosts"],
                        prefetch=0)
    local_ids = [batch["x"][:, 0].tolist() for batch in loader]

    # Global collective across processes: psum of per-host sums must be
    # the full-dataset sum on every host.
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    local_sum = jnp.asarray(sum(sum(b) for b in local_ids), jnp.float32)
    gathered = multihost_utils.process_allgather(local_sum)
    print("RESULT" + json.dumps({
        "pid": pid,
        "local_ids": local_ids,
        "global_sum": float(gathered.sum()),
    }), flush=True)
    """
)


def test_two_process_sharded_loading_and_collectives(tmp_path):
    import os

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(
        WORKER % {
            "coord": "GRL_COORDINATOR_ADDRESS",
            "nproc": "GRL_NUM_PROCESSES",
            "pid": "GRL_PROCESS_ID",
            "repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        }
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    import json

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        rec = json.loads(line[len("RESULT"):])
        results[rec["pid"]] = rec

    # Together the two hosts cover the full shuffled dataset, disjointly.
    ids0 = [i for b in results[0]["local_ids"] for i in b]
    ids1 = [i for b in results[1]["local_ids"] for i in b]
    assert not set(ids0) & set(ids1)
    assert sorted(ids0 + ids1) == list(map(float, range(12)))
    # And the cross-process collective sums to the full dataset on both.
    assert results[0]["global_sum"] == results[1]["global_sum"] == sum(range(12))
