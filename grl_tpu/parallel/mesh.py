"""Device mesh construction + sharding helpers.

The scale-out backbone replacing the reference's NCCL DDP stack
(reference: gnn/cl_warper.py:73-75, gnn/trainer/training_procedures/
base_procedure.py:79-93): one ``jax.sharding.Mesh`` with a ``data`` axis
(batch/data parallel — DDP equivalent), a ``model`` axis (tensor-parallel
sharding of wide projections like RanPAC/classifier), and graph/node
partitioning via shard_map (:mod:`grl_tpu.parallel.graph_partition`) as
the sequence-parallel analog. Collectives are emitted by XLA over ICI.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec


def make_mesh(
    axis_shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; default one ``data`` axis over all local devices.

    ``axis_shape`` maps axis name -> size, e.g. ``{"data": 4, "model": 2}``;
    a -1 size absorbs the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    axis_shape = dict(axis_shape or {"data": len(devices)})
    sizes = list(axis_shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    mesh_devices = mesh_utils.create_device_mesh(
        tuple(sizes), devices=devices[:total]
    )
    return Mesh(mesh_devices, tuple(axis_shape.keys()))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard the leading (batch) dim of every leaf over ``axis``."""

    def put(leaf: Any) -> Any:
        spec = P(axis, *([None] * (np.ndim(leaf) - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


# Default tensor-parallel rules for the GCN family: shard the wide frozen
# RanPAC expansion and the classifier over the model axis (their output
# dims are the largest in the network: half_net*rp_factor -> 1280/10000).
DEFAULT_TP_RULES: Tuple[Tuple[str, PartitionSpec], ...] = (
    (r".*w_rand.*kernel", P(None, "model")),
    (r".*rp_emb.*kernel", P(None, "model")),
    (r".*rp_final.*kernel", P(None, "model")),
    (r".*classifier.*kernel", P("model", None)),
    (r".*classifier.*bias", P(None)),
)


def shard_params(
    tree: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, PartitionSpec]] = DEFAULT_TP_RULES,
) -> Any:
    """Place params by path-pattern rules; unmatched leaves replicate.

    Rules whose spec doesn't divide the leaf's dims fall back to
    replication rather than erroring (small models on big meshes).
    """
    if "model" not in mesh.axis_names:
        return replicate(tree, mesh)
    model_size = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves, treedef = flat

    def place(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        for pattern, spec in rules:
            if re.fullmatch(pattern, name):
                # Validate divisibility on the sharded dims.
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is not None and (
                        dim >= np.ndim(leaf) or leaf.shape[dim] % model_size
                    ):
                        ok = False
                if ok and len(spec) <= np.ndim(leaf):
                    return jax.device_put(leaf, NamedSharding(mesh, spec))
                break
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    placed = [place(path, leaf) for path, leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, placed)
