"""Regenerate docs/model-performance.md's measured section from a
bench.py JSON line — the doc and the driver artifact can then never
diverge (round-3 shipped a hand-transcribed table from a different run
than BENCH_r03.json).

Usage: python scripts/render_perf_doc.py BENCH.json [--date YYYY-MM-DD]
Rewrites the block between the BEGIN/END GENERATED markers in
docs/model-performance.md.
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "model-performance.md")
BEGIN = "<!-- BEGIN GENERATED (scripts/render_perf_doc.py) -->"
END = "<!-- END GENERATED -->"


def fmt_steps(table: dict | None) -> str:
    if not table:
        return "| (none measured) | |\n"
    rows = sorted(table.items(), key=lambda kv: -kv[1])
    return "".join(f"| {k} | {v:.0f} |\n" for k, v in rows)


def render(bench: dict, date: str) -> str:
    lines = [f"### Measured {date} (generated from the bench JSON)\n"]
    lines.append("#### Dense flagship training step (sumi scale)\n")
    lines.append("| Config (per-dispatch) | steps/s |\n|---|---|\n")
    lines.append(fmt_steps(bench.get("steps_per_s")))
    scanned = bench.get("steps_per_s_scanned")
    if scanned:
        lines.append("\n| Config (fused scan dispatch) | steps/s |\n|---|---|\n")
        lines.append(fmt_steps(scanned))
    mfu = bench.get("mfu")
    checks = bench.get("headline_checks") or {}
    lines.append(
        f"\nHeadline config **{bench.get('best_config')}**: "
        f"{bench.get('value'):,.0f} {bench.get('unit')} "
        f"({bench.get('vs_baseline')}x the PyTorch reference on host CPU"
        ", its only runnable path)"
        + (f", MFU {mfu:.3f}" if mfu else "")
        + ".\n"
    )
    if checks:
        prof = checks.get("profiler_s_per_dispatch")
        lines.append(
            "Measurement cross-checks (ms/dispatch): timed window "
            f"{checks.get('window_s_per_dispatch', float('nan')):.2f}, "
            f"single-dispatch {checks.get('t1', float('nan')):.2f} "
            f"(null-dispatch sync {checks.get('t0_sync', float('nan')):.2f})"
            + (f", profiler device time {prof:.2f}" if prof else "")
            + f"; latency_check={bench.get('latency_check')}, "
            f"profiler_check={bench.get('profiler_check')}. "
            "Windows are value-chained (chain scalar through every "
            "dispatch, host float() at window end) and MFU-gated at "
            "0.85 — see bench.py.\n"
        )
    big = bench.get("dense_adj_entries_per_s_N1024")
    if big:
        lines.append("\n#### Larger shape (B=2, N=1024), dense adj entries/s\n")
        lines.append("| Config | adj entries/s |\n|---|---|\n")
        for k, v in sorted(big.items(), key=lambda kv: -kv[1]):
            lines.append(f"| {k} | {v:,.0f} |\n")
    lines.append("\n#### Sparse aggregation (arxiv scale, fwd+bwd, actual nnz)\n")
    se = bench.get("sparse_edges_per_s")
    if se:
        lines.append(
            f"Best impl **{bench.get('sparse_impl')}**: "
            f"{se / 1e9:.3f} B edges/s/chip = "
            f"{100 * (bench.get('sparse_gather_frac') or 0):.0f}% of the "
            "measured gather-transaction roofline "
            f"(byte-floor fraction {bench.get('sparse_hbm_frac')}).\n"
        )
    structures = bench.get("sparse_structures")
    if structures:
        lines.append(
            "\n#### Tile-dense hybrid vs ELL by graph structure "
            "(169k nodes, fwd+bwd, scan-fused protocol)\n"
        )
        lines.append(
            "| Structure | edges | ELL B edges/s | tile B edges/s | "
            "speedup | tile coverage |\n|---|---|---|---|---|---|\n"
        )
        for name, row in structures.items():
            e = row["ell_edges_per_s"]
            t = row["tile_edges_per_s"]
            lines.append(
                f"| {name} | {row['edges']:,} | {e / 1e9:.3f} | "
                f"{t / 1e9:.3f} | {t / e:.2f}x | "
                f"{100 * row['tile_coverage']:.0f}% ({row['tiles']} tiles) |\n"
            )
        lines.append(
            "\nTiles only exist where the (LPA-reordered) adjacency has "
            "blocks above the density threshold; on graphs with no such "
            "structure the planner selects zero tiles and the kernel is "
            "exactly ELL — the homophily fraction's gather floor bounds "
            "the clustered-graph ceiling (~0.29 B edges/s at 20% "
            "cross-community edges).\n"
        )
        tt = (structures.get("products_like") or {}).get(
            "tile_trainer_edges_per_s"
        )
        if tt:
            lines.append(
                f"\nThrough the FULL trainer (kernel_impl=tile + "
                f"plan_projected, scan_steps=10) on the products-like "
                f"graph: **{tt / 1e6:.1f} M edges/s** per epoch.\n"
            )
    fg = bench.get("full_graph_edges_per_s")
    sp = bench.get("sampled_target_nodes_per_s")
    lines.append("\n#### Product procedures at arxiv scale (BASELINE configs 3-4)\n")
    if fg:
        lines.append(
            f"- FullGraphProcedure (kernel_impl=ell + projected tables + "
            f"arithmetic buckets + rbg PRNG, scan_steps=10): "
            f"**{fg / 1e6:.1f} M edges/s** per training epoch through the "
            "real trainer.\n"
        )
    if sp:
        lines.append(
            f"- SampledGraphProcedure (fanouts 10x10, B=256): "
            f"**{sp:,.0f} target nodes/s** including host neighbor "
            "sampling and H2D transfer"
        )
        bd = bench.get("sampled_breakdown")
        if bd:
            lines.append(
                f" (per-step: host sampling "
                f"{bd.get('host_sample_ms')} ms, host buffering "
                f"{bd.get('h2d_ms')} ms, device+dispatch "
                f"{bd.get('device_dispatch_ms')} ms)"
            )
        lines.append(".\n")
    pps = bench.get("serving_pages_per_s")
    if pps:
        lines.append(
            f"- Serving (KVInference end-to-end, 64 pages, batch 8): "
            f"**{pps:.0f} pages/s** — pipelined dispatches, async result "
            "fetches, device-pinned params.\n"
        )
    failed = bench.get("failed_configs")
    lines.append(
        f"\nFailed/flagged configs this run: {failed or 'none'}.\n"
    )
    return "".join(lines)


def main() -> None:
    bench_path = sys.argv[1]
    date = "unknown-date"
    if "--date" in sys.argv:
        date = sys.argv[sys.argv.index("--date") + 1]
    with open(bench_path) as fh:
        # the bench may log stderr noise; take the last JSON-looking line
        payload = [ln for ln in fh.read().splitlines() if ln.startswith("{")]
    bench = json.loads(payload[-1])
    doc = open(DOC).read()
    head, rest = doc.split(BEGIN)
    _, tail = rest.split(END)
    new = head + BEGIN + "\n" + render(bench, date) + END + tail
    open(DOC, "w").write(new)
    print(f"rendered {bench_path} into {DOC}")


if __name__ == "__main__":
    main()
