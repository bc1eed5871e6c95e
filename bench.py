"""Benchmark: flagship GraphCNNDropEdge training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Measures full training-step throughput (forward + backward + Adam update)
at sumi scale (input_dim=4369, output_dim=53, num_edges=6, net_size=256 —
reference: README.md:84) across {pallas, xla} x {bf16, f32}, plus a
larger-N shape, and reports:

* the headline relational-aggregation edge throughput (3 GraphConv layers
  x B x (L+1) x N^2 dense adjacency entries per step — the dense-matmul
  work the reference actually performs, comparable across rounds),
* ``mfu``: achieved model FLOP/s (XLA compiled-executable cost analysis)
  divided by the detected chip's bf16 peak,
* ``sparse_edges_per_s``: actual-nnz edge throughput of the sparse path
  (fwd+bwd) at ogbn-arxiv scale, best of {XLA segment-sum, Pallas CSR},
  with ``sparse_hbm_frac`` giving its HBM-roofline fraction.

``vs_baseline`` compares steps/s against the PyTorch reference model
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
WARMUP, ITERS, WINDOWS = 5, 20, 3
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
CONFIG_KEY = f"drop_edge_train_B{B}_N{N}_L{L}_F{F_IN}_C{C}_net{NET}"

# Peak specs by device_kind substring: (bf16 TFLOP/s, HBM GB/s).
# Public cloud.google.com/tpu/docs system-architecture numbers.
CHIP_PEAKS = {
    "v6": (918e12, 1640e9),   # Trillium / v6e
    "v5p": (459e12, 2765e9),
    "v5": (197e12, 819e9),    # v5e / "v5 lite"
    "v4": (275e12, 1228e9),
    "v3": (123e12, 900e9),
}


def detect_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return None, None


def retry(fn, attempts=3, backoff_s=15.0, label="config"):
    """Run ``fn`` with retries on transient TPU-tunnel failures.

    The axon tunnel is documented as transiently flaky (backend-init /
    remote_compile read errors — see CLAUDE.md); round 2's bench died
    with rc=1 on one such error at the second config. Each config now
    retries independently and failures are isolated by the caller.
    """
    last = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as err:  # noqa: BLE001 — isolate ANY per-config crash
            last = err
            print(
                f"[bench] {label} attempt {attempt + 1}/{attempts} failed: "
                f"{type(err).__name__}: {err}",
                file=sys.stderr,
            )
            if attempt + 1 < attempts:
                time.sleep(backoff_s * (attempt + 1))
    raise last


def edges_per_step(b=B, n=N) -> float:
    return 3.0 * b * (L + 1) * n * n


def measure_tpu(
    kernel_impl: str = "pallas",
    compute_dtype: str | None = None,
    b: int = B,
    n: int = N,
    scan_k: int = 1,
) -> tuple[float, float | None]:
    """(steps/s, model FLOPs/step from XLA cost analysis) on the default
    device for one (kernel, dtype, shape) config of the jitted train step.

    ``scan_k > 1`` fuses that many optimizer steps into one dispatch via
    ``lax.scan`` (the FullGraphProcedure ``scan_steps`` product path):
    per-step dispatch through the TPU tunnel costs ~1.7 ms of host
    round-trip against a ~1.2 ms device step, so the scanned number is
    the honest *device* throughput; the per-dispatch number includes the
    host loop the KVProcedure pays today.
    """
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
    V = jax.random.normal(key, (b, n, F_IN), jnp.float32)
    A = (jax.random.uniform(key, (b, n, L, n)) < DENSITY).astype(jnp.float32)
    labels = jax.random.randint(key, (b, n), 0, C)
    variables = init_model(model, key, (V, A))
    params, constants = variables["params"], variables["constants"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params)

    def step_body(params, opt_state, rng):
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

    if scan_k > 1:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, rng):
            def body(carry, r):
                p, o = carry
                p, o, loss = step_body(p, o, r)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jax.random.split(rng, scan_k)
            )
            return params, opt_state, losses[-1]

    else:
        step = functools.partial(jax.jit, donate_argnums=(0, 1))(step_body)

    # Compile ONCE via lower/compile: the same executable serves the cost
    # analysis (model FLOPs for MFU) and the timing loop.
    flops = None
    compiled = step.lower(params, opt_state, jax.random.PRNGKey(9)).compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0)) or None
        if flops and scan_k > 1:
            # XLA cost analysis counts a scan (while-loop) body ONCE, not
            # per trip — so the reported flops are already ~per-step; do
            # NOT divide by scan_k. MFU for scanned configs is computed
            # from the unscanned executable's analysis in main() instead.
            flops = None
    except Exception:
        pass

    rng = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = compiled(params, opt_state, k)
    jax.block_until_ready(loss)
    # Tunnel TPU timing is noisy (occasional 2-3x slow windows, especially
    # for the first config after backend init). Time WINDOWS independent
    # windows and report the best — the standard defence against one-sided
    # interference noise; the donated params chain keeps every dispatch
    # value-fresh so no window can be memoized.
    best_elapsed = float("inf")
    for _ in range(WINDOWS):
        start = time.perf_counter()
        for _ in range(ITERS):
            rng, k = jax.random.split(rng)
            params, opt_state, loss = compiled(params, opt_state, k)
        jax.block_until_ready(loss)
        best_elapsed = min(best_elapsed, time.perf_counter() - start)
    steps_s = ITERS * scan_k / best_elapsed
    print(
        f"[bench] device={jax.devices()[0]} B={b} N={n} kernel={kernel_impl} "
        f"dtype={compute_dtype or 'float32'}"
        + (f" scan={scan_k}" if scan_k > 1 else "")
        + f" {steps_s:.2f} steps/s"
        + (f" ({flops * steps_s / 1e12:.1f} TFLOP/s)" if flops else ""),
        file=sys.stderr,
    )
    return steps_s, flops


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


def chained_time(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    """Honest seconds/iteration on the tunnel TPU.

    The axon runtime memoizes value-identical dispatches and
    ``block_until_ready`` alone does not force execution of an
    unconsumed lazy result — naive repeat-the-same-call timing loops can
    report physically impossible numbers (measured: a 4096^3 matmul "at"
    3900 TFLOP/s). Protocol: thread a scalar derived from each output
    into the next call's inputs (every dispatch has fresh values and a
    true data dependence) and end with a host fetch. ``fn(*args, s)``
    must return a non-degenerate scalar (use ``chain_scalar``).
    """
    import jax.numpy as jnp

    s = jnp.float32(1.0)
    for _ in range(warmup):
        s = fn(*args, s)
    float(s)
    best = float("inf")
    for _ in range(WINDOWS):
        start = time.perf_counter()
        for _ in range(iters):
            s = fn(*args, s)
        float(s)  # hard device sync (D2H)
        best = min(best, time.perf_counter() - start)
    return best / iters


def chain_scalar(x):
    """Fold an array into a chaotic, non-saturating scalar in [0.5, 1.5).

    ``mean(x*x)`` defeats algebraic collapse (a linear reduction of a
    gather CAN be rewritten away); ``mod`` keeps the value varying so the
    runtime's value-memoization never hits; the range keeps chained
    inputs numerically sane.
    """
    import jax.numpy as jnp

    return jnp.mod(jnp.mean(x * x) / 7.77, 1.0) + 0.5


def measure_sparse(
    hbm_bps: float | None,
) -> tuple[float | None, float | None, str | None, float | None]:
    """Sparse fwd+bwd aggregation at ogbn-arxiv scale, best of
    {XLA gather+segment-sum, Pallas blocked-CSR, ELL dual-gather}.

    Returns (actual-nnz edges/s, HBM-roofline fraction, winning impl,
    gather-roofline fraction). The op is gather-TRANSACTION-bound on TPU
    (row gathers hit a latency*queue-depth wall at ~0.3-0.4 B rows/s
    regardless of row width <=512B — measured in-run below), so the
    honest speed-of-light is ``gather_ceiling / 2`` edges/s (one gathered
    row per edge per direction, zero padding); ``gather_frac`` reports
    achieved/that. The byte-based ``hbm_frac`` is kept for continuity
    but understates an already transaction-bound kernel.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grl_tpu.data.large_graph import sbm_relational_graph, to_relational_graph
    from grl_tpu.ops.ell import ELLGraphKernel
    from grl_tpu.ops.pallas.csr_spmm import CSRGraphKernel
    from grl_tpu.ops.sparse import relational_neighbor_coo

    sbm = sbm_relational_graph(
        num_nodes=169_343, num_classes=40, num_relations=1,
        avg_degree=7, feature_dim=128, seed=0,
    )
    graph, feats = to_relational_graph(sbm)
    V = jnp.asarray(feats)
    E = int(np.asarray(graph.mask).sum())
    Nn, F = graph.num_nodes, V.shape[-1]

    # In-run gather-transaction ceiling: E random row gathers + reduce.
    probe_idx = jnp.asarray(
        np.random.RandomState(7).randint(0, Nn, E).astype(np.int32)
    )

    @jax.jit
    def gather_probe(v, i, s):
        return chain_scalar(jnp.take(v * s, i, axis=0))

    gather_rate = E / retry(
        lambda: chained_time(gather_probe, V, probe_idx),
        label="gather ceiling probe",
    )
    print(
        f"[bench] measured gather ceiling: {gather_rate / 1e6:.0f} M rows/s "
        f"-> sparse speed-of-light {gather_rate / 2 / 1e9:.3f} B edges/s "
        "(fwd+bwd, 1 gathered row per edge per direction)",
        file=sys.stderr,
    )

    @jax.jit
    def xla_grad(v, s):
        g = jax.grad(
            lambda x: (relational_neighbor_coo(x, graph) ** 2).sum()
        )(v * s)
        return chain_scalar(g)

    results = {}
    results["xla segsum"] = retry(
        lambda: chained_time(xla_grad, V), label="sparse xla segsum"
    )

    def run_kernel(cls):
        kern = cls(
            np.asarray(graph.senders), np.asarray(graph.receivers),
            np.asarray(graph.relations), np.asarray(graph.weights),
            num_nodes=Nn, num_relations=graph.num_relations, feature_dim=F,
        )

        @jax.jit
        def kern_grad(v, s):
            g = jax.grad(
                lambda x: (kern.neighbor_aggregate(x, 0, 0.0) ** 2).sum()
            )(v * s)
            return chain_scalar(g)

        return chained_time(kern_grad, V)

    for name, cls in (("ell", ELLGraphKernel), ("pallas csr", CSRGraphKernel)):
        try:
            results[name] = retry(
                lambda c=cls: run_kernel(c), label=f"sparse {name}"
            )
        except Exception as err:
            print(f"[bench] {name} sparse failed: {err}", file=sys.stderr)

    # Byte-based floor (kept for cross-round continuity): read V and the
    # cotangent once each, write out + dV, edge metadata twice.
    itemsize = V.dtype.itemsize
    min_bytes = 2 * (itemsize * Nn * F + itemsize * Nn * F + 12 * E)
    sol = gather_rate / 2  # transaction-roofline edges/s
    for name, dt in results.items():
        frac = min_bytes / dt / hbm_bps if hbm_bps else None
        print(
            f"[bench] sparse fwd+bwd ({name}, arxiv-scale, {E:,} edges, F={F}): "
            f"{E / dt / 1e9:.3f} B edges/s/chip, "
            f"{100 * E / dt / sol:.0f}% of gather roofline"
            + (f", ~{100 * frac:.0f}% of HBM-byte floor" if frac else ""),
            file=sys.stderr,
        )
    best_name = min(results, key=results.get)
    best = results[best_name]
    frac = (min_bytes / best / hbm_bps) if hbm_bps else None
    return E / best, frac, best_name, E / best / sol


def main() -> None:
    quick = "--quick" in sys.argv  # single-config fast run (ADVICE r1)
    failed: list[str] = []

    try:
        peak_flops, hbm_bps = retry(detect_peaks, label="device detect")
    except Exception as err:
        print(f"[bench] device detect failed: {err}", file=sys.stderr)
        peak_flops = hbm_bps = None
        failed.append("device_detect")

    configs: dict[str, float] = {}
    flops_by_cfg: dict[str, float | None] = {}
    sweep = [("pallas", "bfloat16")] if quick else [
        ("pallas", "bfloat16"),
        ("xla", "bfloat16"),
        ("pallas", None),
        ("xla", None),
    ]
    for impl, dt in sweep:
        name = f"{impl}+{dt or 'f32'}"
        try:
            configs[name], flops_by_cfg[name] = retry(
                lambda i=impl, d=dt: measure_tpu(i, d), label=f"dense {name}"
            )
        except Exception as err:
            print(f"[bench] dense {name} failed: {err}", file=sys.stderr)
            failed.append(f"dense:{name}")

    best_name = max(configs, key=configs.get) if configs else None
    tpu_steps = configs.get(best_name)
    if not quick and configs and best_name != "pallas+bfloat16":
        print(
            f"[bench] WARNING: fastest config is {best_name}, "
            "not pallas+bfloat16", file=sys.stderr,
        )

    # Headline: re-measure with scan_steps=10 (the scan_steps fused-
    # dispatch product path) — per-step dispatch through the tunnel costs
    # more host round-trip than the device step itself, so the scanned
    # number is the honest device throughput. The per-dispatch ranking is
    # dominated by that overhead and does NOT predict the scanned
    # ranking, so both leading candidates are scanned and the best wins.
    scanned: dict[str, float] = {}
    candidates = {best_name} | ({"pallas+bfloat16"} if configs else set())
    for name in sorted(c for c in candidates if c in configs):
        impl = name.split("+")[0]
        dt = None if name.endswith("+f32") else name.split("+")[1]
        try:
            scanned[name], _ = retry(
                lambda i=impl, d=dt: measure_tpu(i, d, scan_k=10),
                label=f"scanned {name}",
            )
        except Exception as err:
            print(f"[bench] scanned {name} failed: {err}", file=sys.stderr)
            failed.append(f"scanned:{name}")

    scanned_best = max(scanned, key=scanned.get) if scanned else None
    scanned_steps = scanned.get(scanned_best)
    headline_steps = scanned_steps or tpu_steps
    mfu = None
    # MFU from the unscanned executable's per-step flops (the scanned
    # executable's cost analysis counts its scan body once — unusable).
    step_flops = flops_by_cfg.get(scanned_best or best_name) if configs else None
    if step_flops and peak_flops and headline_steps:
        mfu = round(step_flops * headline_steps / peak_flops, 4)

    # Larger-N shape (stderr table only; same metric definition).
    big = {}
    if not quick:
        for impl, dt in (("pallas", "bfloat16"), ("xla", "bfloat16")):
            try:
                s, _ = retry(
                    lambda i=impl, d=dt: measure_tpu(i, d, b=2, n=1024),
                    label=f"large-N {impl}+{dt}",
                )
                big[f"{impl}+{dt}"] = round(s * edges_per_step(2, 1024), 1)
            except Exception as err:
                print(f"[bench] large-N dense failed: {err}", file=sys.stderr)
                failed.append(f"large_n:{impl}+{dt}")

    sparse_eps = sparse_frac = sparse_impl = sparse_gather_frac = None
    try:
        sparse_eps, sparse_frac, sparse_impl, sparse_gather_frac = (
            measure_sparse(hbm_bps)
        )
    except Exception as err:
        print(f"[bench] sparse side-metric failed: {err}", file=sys.stderr)
        failed.append("sparse")

    try:
        baseline_steps = measure_torch_baseline()
    except Exception as err:  # baseline unavailable: report absolute only
        print(f"[bench] baseline measurement failed: {err}", file=sys.stderr)
        baseline_steps = None
        failed.append("torch_baseline")

    value = headline_steps * edges_per_step() if headline_steps else None
    vs = (
        round(headline_steps / baseline_steps, 3)
        if headline_steps and baseline_steps
        else None
    )
    print(
        json.dumps(
            {
                "metric": "dropedge_train_edge_throughput",
                "value": round(value, 1) if value else None,
                "unit": "edges/s/chip",
                "vs_baseline": vs,
                "mfu": mfu,
                "best_config": scanned_best or best_name,
                "steps_per_s_scanned": {
                    k: round(v, 2) for k, v in scanned.items()
                }
                or None,
                "steps_per_s": {k: round(v, 2) for k, v in configs.items()},
                "edges_per_s_N1024": big or None,
                "sparse_edges_per_s": round(sparse_eps, 1) if sparse_eps else None,
                "sparse_hbm_frac": round(sparse_frac, 3) if sparse_frac else None,
                "sparse_gather_frac": round(sparse_gather_frac, 3)
                if sparse_gather_frac
                else None,
                "sparse_impl": sparse_impl,
                "failed_configs": failed or None,
            }
        )
    )


if __name__ == "__main__":
    main()
