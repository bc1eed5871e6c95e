"""TPU gather microprobe — what is the sparse aggregation's true ceiling?

The ELL sparse kernel's hot loop is row gathers (grl_tpu/ops/ell.py);
round-3 measured XLA's random-row gather at ~0.31 B rows/s (~160 GB/s,
~20% of HBM) and called it the roofline. This probe tests every lever
that could beat it (VERDICT r3 #2):

  A  XLA gather, random indices           (the round-3 "ceiling")
  B  XLA gather, sorted/semi-local indices (does locality help XLA?)
  C  XLA gather, bf16 rows                 (byte-bound component?)
  D  XLA gather, wider rows                (transaction- vs byte-bound)
  E  Pallas VMEM dynamic gather            (does Mosaic compile jnp.take
                                            on a VMEM-resident window,
                                            and at what rate?)
  F  Pallas windowed stream                (contiguous window DMA +
                                            VMEM-local gather pipeline)
  G  Pallas per-row DMA                    (8-deep async single-row
                                            copies: DMA-issue-bound rate)

Timing uses bench.chained_time (value-chained dispatches + host fetch —
the only protocol the tunnel cannot fool). Prints one JSON line.

MEASURED (2026-08-21, TPU v5e via tunnel — see docs/model-performance.md):
A 311 / B1 316 / B2 320 / C 324 M rows/s — the gather emitter's rate is
INSENSITIVE to index locality and dtype. D: 1 KB rows 199 M rows/s
(204 GB/s), 2 KB rows 142 M rows/s (291 GB/s) — partially
transaction-bound, partially byte-bound; no row width approaches the
819 GB/s HBM peak. E/F/G: every Pallas alternative is unavailable on
this toolchain — jnp.take with vector indices is rejected by the Mosaic
lowering ("Shape mismatch in input, indices and output"),
take_along_axis (the hardware dynamic-gather form) crashes or hangs the
remote tpu_compile_helper (HTTP 500 / no return within 580 s), and the
scalar-loop and per-row-DMA kernels hang the same compiler. Hence
~0.31 B random rows/s is this stack's gather limit, and the ELL
kernel's 0.125 B edges/s fwd+bwd (= 2 gathers/edge + stitch) sits at
the emitter-rate bound for its transaction count.

Usage: timeout 580 python scripts/probe_gather.py [--quick]
       --pallas  also run the Pallas probes (WARNING: known to hang the
                 remote compiler on this toolchain — run under timeout)
"""
from __future__ import annotations

import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from bench import chain_scalar, chained_time, detect_peaks, retry  # noqa: E402

N, F, E = 169_343, 128, 1_183_000  # arxiv-scale shapes (round-3 bench)
results: dict = {}
failures: dict = {}


def run(name, fn):
    try:
        rate = retry(fn, attempts=2, label=name)
        results[name] = round(rate / 1e6, 1)  # M rows/s
        print(f"[probe] {name}: {rate / 1e6:.0f} M rows/s", file=sys.stderr)
    except Exception as err:
        failures[name] = f"{type(err).__name__}: {err}"
        print(f"[probe] {name} FAILED: {err}", file=sys.stderr)


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[probe] device {dev.platform}/{dev.device_kind}", file=sys.stderr)
    peak_flops, hbm_bps = detect_peaks()

    rng = np.random.RandomState(0)
    V32 = jnp.asarray(rng.randn(N, F).astype(np.float32))
    V16 = V32.astype(jnp.bfloat16)
    idx_rand = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    idx_sorted = jnp.sort(idx_rand)
    # Semi-local: random-within-window indices in row-block order — the
    # access pattern an RCM/cluster reorder produces (each block of 256
    # consecutive gathers stays inside one 2048-row window).
    blocks = E // 256
    base = (rng.randint(0, max(N // 2048, 1), blocks) * 2048)[:, None]
    semi = base + rng.randint(0, 2048, (blocks, 256))
    idx_semi = jnp.asarray(np.minimum(semi.ravel(), N - 1).astype(np.int32))

    def xla_gather(V, idx):
        @jax.jit
        def f(V, idx, s):
            return chain_scalar(jnp.take(V * s, idx, axis=0))

        return E / chained_time(f, V, idx)

    pallas_only = "--pallas-only" in sys.argv
    want_pallas = pallas_only or "--pallas" in sys.argv
    if not pallas_only:
        run("A_xla_random_f32", lambda: xla_gather(V32, idx_rand))
        run("B1_xla_sorted_f32", lambda: xla_gather(V32, idx_sorted))
        run("B2_xla_semilocal_f32", lambda: xla_gather(V32, idx_semi))
        run("C_xla_random_bf16", lambda: xla_gather(V16, idx_rand))

    if "--quick" not in sys.argv and not pallas_only:
        for width in (256, 512):
            Vw = jnp.asarray(rng.randn(N // (width // F), width).astype(np.float32))
            idx_w = jnp.asarray(
                rng.randint(0, Vw.shape[0], E).astype(np.int32)
            )
            run(
                f"D_xla_random_f32_w{width}",
                lambda Vw=Vw, idx_w=idx_w: xla_gather(Vw, idx_w),
            )

    # ------------------------------------------------------------------
    # E: Mosaic VMEM dynamic gather. Window of 2048 rows resident in
    # VMEM; each grid step gathers 2048 rows by dynamic index and
    # accumulates. Compiles only if Mosaic supports sublane dynamic
    # gather / take on this jaxlib.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 2048  # window rows
    R = 2048  # gathered rows per grid step

    def vmem_take_kernel(win_ref, idx_ref, out_ref):
        win = win_ref[...]
        # idx block (8, 256): 8 strips of 256 1-D indices (tile-legal).
        for k in range(8):
            out_ref[k * 256:(k + 1) * 256, :] = jnp.take(
                win, idx_ref[0, k], axis=0
            )

    def vmem_tala_kernel(win_ref, idx_ref, out_ref):
        # take_along_axis form: per-(sublane, lane) indices — the
        # hardware dynamic-gather shape.
        out_ref[...] = jnp.take_along_axis(
            win_ref[...], idx_ref[...], axis=0
        )

    def probe_vmem_take():
        grid = E // R
        win = V32[:M]
        idx_local = jnp.asarray(
            rng.randint(0, M, (grid, 8, 256)).astype(np.int32)
        )

        @jax.jit
        def f(win, idx, s):
            return chain_scalar(
                pl.pallas_call(
                    vmem_take_kernel,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((M, F), lambda i: (0, 0)),
                        pl.BlockSpec((1, 8, 256), lambda i: (i, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((R, F), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((grid * R, F), jnp.float32),
                )(win * s, idx)
            )

        return grid * R / chained_time(f, win, idx_local)

    def probe_vmem_tala():
        grid = E // R
        win = V32[:M]
        idx_np = rng.randint(0, M, (grid * R, 1)).astype(np.int32)
        idx_b = jnp.asarray(np.broadcast_to(idx_np, (grid * R, F)).copy())

        @jax.jit
        def f(win, idx, s):
            return chain_scalar(
                pl.pallas_call(
                    vmem_tala_kernel,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((M, F), lambda i: (0, 0)),
                        pl.BlockSpec((R, F), lambda i: (i, 0)),
                    ],
                    out_specs=pl.BlockSpec((R, F), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((grid * R, F), jnp.float32),
                )(win * s, idx)
            )

        return grid * R / chained_time(f, win, idx_b)

    if want_pallas:
        run("E1_pallas_vmem_take", probe_vmem_take)
        run("E2_pallas_vmem_take_along", probe_vmem_tala)

    # ------------------------------------------------------------------
    # F: windowed stream — grid over windows; each step's window block is
    # streamed HBM->VMEM by the pallas pipeline (contiguous!), then R
    # rows gather VMEM-locally (needs E to work). Banded synthetic
    # pattern: gather i-th block's rows from window i.
    def windowed_kernel(win_ref, idx_ref, out_ref):
        win = win_ref[...]

        def body(k, _):
            out_ref[pl.ds(k * 256, 256), :] = jnp.take(
                win, idx_ref[0, k], axis=0
            )
            return 0

        jax.lax.fori_loop(0, idx_ref.shape[1], body, 0)

    def probe_windowed():
        n_win = 64  # windows streamed through the pallas pipeline
        strips = 64  # 64 strips x 256 idx = 16384 gathered rows / window
        idx_local = jnp.asarray(
            rng.randint(0, M, (n_win, strips, 256)).astype(np.int32)
        )

        def call(V, idx):
            return pl.pallas_call(
                windowed_kernel,
                grid=(n_win,),
                in_specs=[
                    pl.BlockSpec((M, F), lambda i: (i, 0)),
                    pl.BlockSpec((1, strips, 256), lambda i: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((strips * 256, F), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (n_win * strips * 256, F), jnp.float32
                ),
            )(V, idx)

        @jax.jit
        def f(V, idx, s):
            return chain_scalar(call(V * s, idx))

        return n_win * strips * 256 / chained_time(f, V32[: n_win * M], idx_local)

    if want_pallas:
        run("F_pallas_windowed_stream", probe_windowed)

    # ------------------------------------------------------------------
    # G: per-row DMA issue rate — 8-deep pipelined single-row copies;
    # grid over blocks of 1024 rows (idx blocks live in SMEM as (8, 128)).
    R_DMA = 1024
    DEPTH = 8

    def dma_kernel(idx_ref, hbm_ref, out_ref):
        def body(scratch, sems):
            def get(slot, j):
                return pltpu.make_async_copy(
                    hbm_ref.at[idx_ref[0, j // 128, j % 128]],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for j in range(DEPTH):
                get(j, j).start()

            def loop(j, acc):
                slot = j % DEPTH
                get(slot, j).wait()
                acc = acc + scratch[slot]

                @pl.when(j + DEPTH < R_DMA)
                def _():
                    get(slot, j + DEPTH).start()

                return acc

            acc = jax.lax.fori_loop(
                0, R_DMA, loop, jnp.zeros((F,), jnp.float32)
            )
            out_ref[...] = acc[None]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((DEPTH, F), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((DEPTH,)),
        )

    def probe_row_dma():
        n_blocks = 32

        def call(idx, V):
            return pl.pallas_call(
                dma_kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec(
                        (1, R_DMA // 128, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, F), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((n_blocks, F), jnp.float32),
            )(idx, V)

        idx = jnp.asarray(
            rng.randint(0, N, (n_blocks, R_DMA // 128, 128)).astype(np.int32)
        )

        @jax.jit
        def f(idx, V, s):
            return chain_scalar(call(idx, V * s))

        return n_blocks * R_DMA / chained_time(f, idx, V32, iters=5)

    if want_pallas:
        run("G_pallas_row_dma", probe_row_dma)

    # H: XLA gather from a VMEM-sized source — does XLA specialize small-
    # source gathers? (Runs LAST with fewer indices: this shape has shown
    # pathological compile/runtime behavior.)
    if "--with-small-src" in sys.argv:
        def probe_small_source(M_src):
            src = V32[:M_src]
            idx_s = jnp.asarray(
                rng.randint(0, M_src, E // 8).astype(np.int32)
            )

            @jax.jit
            def f(V, idx, s):
                return chain_scalar(jnp.take(V * s, idx, axis=0))

            return (E // 8) / chained_time(f, src, idx_s, iters=5)

        run("H1_xla_small_src_2048", lambda: probe_small_source(2048))

    out = {
        "unit": "M rows/s (row = 512 B f32 / 256 B bf16)",
        "shapes": {"N": N, "F": F, "E": E},
        "hbm_peak_rows_per_s_f32": round(hbm_bps / (F * 4) / 1e6, 1)
        if hbm_bps
        else None,
        "results": results,
        "failures": failures or None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
