"""Micro-benchmarks of the hot per-iteration primitives, in isolation.

Usage: ``python benchmark/microbench_ops.py <op> <n_iters> [N]`` — runs one
fresh-process measurement of ``n_iters`` applications of ``<op>`` on a size-N
problem chained through a ``lax.fori_loop`` (data-dependent, so XLA can't
elide repeats), terminated by a single device->host fetch; prints one JSON
line with the wall time.  Run the same op at two iteration counts and take
the slope, as in ``bench.py`` (fresh process per point: on the shared
tunneled pool ``block_until_ready`` is a no-op and the first fetch of a
process degrades later launches).

Ops:
  gather        y = x[perm]                      (the csc-layout lambda-gather analog)
  segsum        g = segment_sum(x, rows, m)      (the csc-layout gradient scatter)
  butterfly     y = B(x); x' = B^-1(y)           (one fwd+rev carry pair, TPU kernel)
  butterfly_jnp same, pure-jnp stages
  tilemath      z = a*s[:,None]+k*c; x=clip; partials   (dense per-tile math, no carries)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    op = sys.argv[1]
    n_iters = int(sys.argv[2])
    N = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 22)
    m = 10_000

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=N).astype(np.float32))

    if op in ("butterfly", "butterfly_jnp"):
        from dualip_tpu.ops.butterfly import apply_butterfly, apply_butterfly_tpu, benes_route

        t0 = time.perf_counter()
        plan = benes_route(rng.permutation(N))
        build_s = time.perf_counter() - t0
        apply = apply_butterfly_tpu if op == "butterfly" else apply_butterfly

        def body(_, v):
            y = apply(plan, v)
            return apply(plan, y, reverse=True)

    elif op == "gather":
        perm = jnp.asarray(rng.permutation(N).astype(np.int32))
        build_s = 0.0

        def body(_, v):
            return v[perm] + 1.0  # +1 keeps each round distinct

    elif op == "segsum":
        rows = jnp.asarray(rng.integers(0, m, size=N).astype(np.int32))
        build_s = 0.0

        def body(_, v):
            g = jax.ops.segment_sum(v, rows, num_segments=m)
            return v + g[0]

    elif op == "tilemath":
        K = N // 16
        a = jnp.asarray(rng.normal(size=(K, 16)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(K, 16)).astype(np.float32))
        build_s = 0.0

        def body(_, v):
            s = v[:K]
            z = a * s[:, None] + 0.5 * c
            x = jnp.clip(z, 0.0, 1.0)
            red = jnp.sum(x * x) + jnp.sum(c * x)
            return v + red / N

        x0 = jnp.asarray(rng.normal(size=N).astype(np.float32))
    else:
        raise SystemExit(f"unknown op {op}")

    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, n_iters, body, v)

    t0 = time.perf_counter()
    out = run(x0)
    val = float(np.asarray(out)[0])  # terminal fetch
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": op,
                "N": N,
                "iters": n_iters,
                "wall_s": round(wall, 3),
                "build_s": round(build_s, 1),
                "check": val,
            }
        )
    )


if __name__ == "__main__":
    main()
