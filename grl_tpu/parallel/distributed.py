"""Multi-host (DCN) scaffolding: jax.distributed initialization + per-host
data sharding wiring.

The reference's multi-process story is NCCL DDP: ``init_process_group``
from env:// rendezvous, one GPU per local rank, DistributedSampler batch
split (reference: gnn/cl_warper.py:73-75,
gnn/trainer/training_procedures/base_procedure.py:87-92,
gnn/data_generator/base_dataloader.py:90-95). The TPU-native equivalent:
``jax.distributed.initialize`` once per host process, a global mesh over
all hosts' devices (XLA routes collectives over ICI within a slice and
DCN across), and the DataLoader's ``host_id/num_hosts`` derived from
``jax.process_index()/process_count()`` — which this module wires into
the config so the per-host batch shard actually happens.

Launch contract (one process per host):

    GRL_COORDINATOR_ADDRESS=host0:9977 GRL_NUM_PROCESSES=2 \\
    GRL_PROCESS_ID=0 python scripts/demo_training.py --config ...

or a ``parallel.distributed`` config block with the same keys. On cloud
TPU pods, ``jax.distributed.initialize()`` auto-detects all three from
the TPU metadata — leave them unset.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from grl_tpu.utils.logging import get_logger

ENV_COORDINATOR = "GRL_COORDINATOR_ADDRESS"
ENV_NUM_PROCESSES = "GRL_NUM_PROCESSES"
ENV_PROCESS_ID = "GRL_PROCESS_ID"


def initialize_distributed(config: Optional[Any] = None) -> Tuple[int, int]:
    """Initialize the multi-host runtime if configured; return
    ``(host_id, num_hosts)``.

    Resolution order: ``config.parallel.distributed`` block, then the
    ``GRL_*`` env vars, then (on TPU pods) jax's own auto-detection when
    ``auto: true`` is set. Single-process when nothing is configured.
    Idempotent: a second call just reports the live process indices.
    """
    import jax

    logger = get_logger("distributed")
    spec = {}
    if config is not None and hasattr(config, "get_path"):
        spec = dict(config.get_path("parallel.distributed") or {})
    coordinator = spec.get("coordinator_address") or os.environ.get(ENV_COORDINATOR)
    num_processes = spec.get("num_processes") or os.environ.get(ENV_NUM_PROCESSES)
    process_id = spec.get("process_id", os.environ.get(ENV_PROCESS_ID))
    auto = bool(spec.get("auto", False))

    already = getattr(jax._src.distributed.global_state, "client", None) is not None
    if already:
        pass
    elif auto:
        jax.distributed.initialize()
    elif coordinator and num_processes and int(num_processes) > 1:
        if str(jax.config.jax_platforms or "").startswith("cpu"):
            # Multi-process CPU runs (tests, dry runs) need the gloo
            # cross-process collectives backend.
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id or 0),
        )
    host_id = jax.process_index()
    num_hosts = jax.process_count()
    if num_hosts > 1:
        logger.info(
            f"multi-host runtime: process {host_id}/{num_hosts}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    if config is not None:
        # The DataLoader reads these for the per-host batch shard
        # (grl_tpu/data/dataloader.py host_id/num_hosts).
        config["host_id"] = host_id
        config["num_hosts"] = num_hosts
    return host_id, num_hosts
