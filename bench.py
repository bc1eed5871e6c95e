"""Benchmark: flagship GraphCNNDropEdge training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures full training-step throughput (forward + backward + Adam update)
at sumi scale (input_dim=4369, output_dim=53, num_edges=6, net_size=256 —
reference: README.md:84) and reports relational-aggregation edge
throughput: 3 GraphConv layers x B x (L+1) x N^2 dense adjacency entries
per step.

``vs_baseline`` compares against the PyTorch reference model
(gnn/models/networks/drop_robust_gcn.py:31-103) running the identical
training step on this host's CPU — the only execution path the reference
supports here (it has no TPU backend; that gap is the point of this
framework). The baseline measurement is cached in .bench_baseline.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

B, N, L, F_IN, C, NET = 8, 256, 6, 4369, 53, 256
DENSITY = 0.03
WARMUP, ITERS = 5, 20
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
CONFIG_KEY = f"drop_edge_train_B{B}_N{N}_L{L}_F{F_IN}_C{C}_net{NET}"


def edges_per_step() -> float:
    return 3.0 * B * (L + 1) * N * N


def measure_tpu(kernel_impl: str = "pallas", compute_dtype: str | None = None) -> float:
    """Training steps/s of the jitted jax model on the default device."""
    import jax
    import jax.numpy as jnp
    import optax

    from grl_tpu.models import GraphCNNDropEdge, init_model
    from grl_tpu.trainer.losses import cross_entropy

    key = jax.random.PRNGKey(0)
    model = GraphCNNDropEdge(
        input_dim=F_IN, output_dim=C, num_edges=L, net_size=NET,
        kernel_impl=kernel_impl, compute_dtype=compute_dtype,
    )
    V = jax.random.normal(key, (B, N, F_IN), jnp.float32)
    A = (jax.random.uniform(key, (B, N, L, N)) < DENSITY).astype(jnp.float32)
    labels = jax.random.randint(key, (B, N), 0, C)
    variables = init_model(model, key, (V, A))
    params, constants = variables["params"], variables["constants"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, "constants": constants},
                (V, A),
                train=True,
                rngs={"dropout": rng},
            )
            return cross_entropy(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    rng = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, k)
    jax.block_until_ready(loss)
    start = time.perf_counter()
    for i in range(ITERS):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, k)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - start
    print(
        f"[bench] device={jax.devices()[0]} kernel={kernel_impl} "
        f"dtype={compute_dtype or 'float32'} {ITERS / elapsed:.2f} steps/s",
        file=sys.stderr,
    )
    return ITERS / elapsed


def measure_torch_baseline() -> float:
    """Reference PyTorch model, same training step, CPU; steps/s (cached)."""
    if os.path.exists(BASELINE_CACHE):
        cache = json.load(open(BASELINE_CACHE))
        if CONFIG_KEY in cache:
            return cache[CONFIG_KEY]
    import numpy as np
    import torch

    from tests.reference_loader import import_reference_models

    _, drop_ref = import_reference_models()
    torch.manual_seed(0)
    model = drop_ref.GraphCNNDropEdge(F_IN, C, L, net_size=NET)
    model.train()
    rng = np.random.RandomState(0)
    V = torch.from_numpy(rng.randn(B, N, F_IN).astype(np.float32))
    A = torch.from_numpy((rng.rand(B, N, L, N) < DENSITY).astype(np.float32))
    labels = torch.from_numpy(rng.randint(0, C, (B, N)))
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
    criterion = torch.nn.CrossEntropyLoss()

    def step():
        optimizer.zero_grad()
        logits = model([V, A])
        loss = criterion(logits.transpose(1, 2), labels)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        optimizer.step()

    step()  # warmup
    iters = 3
    start = time.perf_counter()
    for _ in range(iters):
        step()
    steps_per_s = iters / (time.perf_counter() - start)
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        cache = json.load(open(BASELINE_CACHE))
    cache[CONFIG_KEY] = steps_per_s
    json.dump(cache, open(BASELINE_CACHE, "w"), indent=2)
    print(f"[bench] torch CPU baseline {steps_per_s:.3f} steps/s", file=sys.stderr)
    return steps_per_s


def measure_sparse_spmm() -> None:
    """Side metric: COO SpMM edges/s at ogbn-arxiv scale (stderr only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grl_tpu.data.large_graph import sbm_relational_graph, to_relational_graph
    from grl_tpu.ops.sparse import relational_aggregate_coo

    sbm = sbm_relational_graph(
        num_nodes=169_343, num_classes=40, num_relations=1,
        avg_degree=7, feature_dim=128, seed=0,
    )
    graph, feats = to_relational_graph(sbm)
    V = jnp.asarray(feats)
    E = int(np.asarray(graph.mask).sum())

    @jax.jit
    def chain(v):
        def body(_, v):
            out = relational_aggregate_coo(v, graph)
            return out[:, : v.shape[1]] * 1e-3 + v

        return jax.lax.fori_loop(0, 20, body, v)

    jax.block_until_ready(chain(V))
    start = time.perf_counter()
    jax.block_until_ready(chain(V))
    dt = (time.perf_counter() - start) / 20
    print(
        f"[bench] sparse SpMM (arxiv-scale, {E:,} edges, F=128): "
        f"{E / dt / 1e9:.2f} B edges/s/chip",
        file=sys.stderr,
    )


def main() -> None:
    # Best of {fused Pallas, XLA} x {bf16 mixed precision, f32}.
    tpu_steps = max(
        measure_tpu("pallas", "bfloat16"),
        measure_tpu("xla", "bfloat16"),
        measure_tpu("pallas"),
        measure_tpu("xla"),
    )
    try:
        measure_sparse_spmm()
    except Exception as err:
        print(f"[bench] sparse spmm side-metric failed: {err}", file=sys.stderr)
    try:
        baseline_steps = measure_torch_baseline()
    except Exception as err:  # baseline unavailable: report absolute only
        print(f"[bench] baseline measurement failed: {err}", file=sys.stderr)
        baseline_steps = None
    value = tpu_steps * edges_per_step()
    vs = round(tpu_steps / baseline_steps, 3) if baseline_steps else None
    print(
        json.dumps(
            {
                "metric": "dropedge_train_edge_throughput",
                "value": round(value, 1),
                "unit": "edges/s/chip",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
