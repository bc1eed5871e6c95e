"""Benchmark: fused sparse attention vs the XLA segment-op path (TPU).

Edge-restricted attention at OGB-ish scale (fwd+bwd through all three
projections), honest chained-dispatch timing (see bench.py:chained_time).
Prints one JSON line with M edges/s for both implementations.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

N, E, K, F = 100_000, 800_000, 16, 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import chain_scalar, chained_time, retry
    from grl_tpu.ops.pallas.sparse_attention import SparseAttentionKernel
    from grl_tpu.ops.segment import segment_softmax, segment_sum

    rng = np.random.RandomState(0)
    senders = rng.randint(0, N, E).astype(np.int32)
    receivers = rng.randint(0, N, E).astype(np.int32)
    f = jnp.asarray(rng.randn(N, K).astype(np.float32))
    g = jnp.asarray(rng.randn(N, K).astype(np.float32))
    h = jnp.asarray(rng.randn(N, F).astype(np.float32))
    kern = SparseAttentionKernel(senders, receivers, num_nodes=N)

    s_j, r_j = jnp.asarray(senders), jnp.asarray(receivers)

    def seg_attend(f_, g_, h_):
        scores = jnp.sum(f_[r_j] * g_[s_j], axis=-1)
        alpha = segment_softmax(
            scores.astype(jnp.float32), r_j, N, mask=jnp.ones(E, bool)
        )
        return segment_sum(h_[s_j] * alpha[:, None], r_j, N)

    w = jnp.asarray(rng.randn(F).astype(np.float32))

    def make(fn):
        @jax.jit
        def run(s):
            d = jax.grad(
                lambda args: jnp.sum(fn(*args) * w) * s, argnums=0
            )((f, g, h))
            return chain_scalar(
                jnp.concatenate([x.ravel() for x in d])
            )

        return run

    out = {"metric": "sparse_attention_edges_per_s", "unit": "edges/s/chip"}
    for name, fn in (
        ("fused_ell", lambda a, b, c: kern.attend(a, b, c)),
        ("xla_segment", seg_attend),
    ):
        dt = retry(lambda: chained_time(make(fn), iters=10), label=name)
        out[name] = round(E / dt, 1)
        print(
            f"[atten] {name}: {dt * 1e3:.2f} ms fwd+bwd -> "
            f"{E / dt / 1e6:.1f} M edges/s",
            file=sys.stderr,
        )
    out["value"] = out["fused_ell"]
    out["speedup_vs_segment"] = round(out["fused_ell"] / out["xla_segment"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
