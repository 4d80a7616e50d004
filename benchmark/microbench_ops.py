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
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
        if op == "butterfly":
            from dualip_tpu.ops.butterfly import pack_plan

            plan = pack_plan(plan)
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

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(v, n):
        return jax.lax.fori_loop(0, n, body, v)

    def timed(n):
        t0 = time.perf_counter()
        out = run(x0, n)
        val = float(np.asarray(out)[0])  # terminal fetch
        return time.perf_counter() - t0, val

    # Warmup launch+fetch: absorbs compile AND the first-fetch arg-restaging
    # degradation, so the two timed windows below are in the same regime and
    # adjacent in time (pool contention is correlated on the seconds scale).
    n_small = max(2, n_iters // 10)
    timed(n_small)  # compile for n_small + absorb first-fetch degradation
    run.lower(x0, n=n_iters).compile()  # compile n_iters without executing
    t_small, _ = timed(n_small)
    t_big, val = timed(n_iters)
    slope_ms = (t_big - t_small) / (n_iters - n_small) * 1000
    print(
        json.dumps(
            {
                "op": op,
                "N": N,
                "iters": n_iters,
                "t_small_s": round(t_small, 3),
                "t_big_s": round(t_big, 3),
                "ms_per_iter": round(slope_ms, 3),
                "build_s": round(build_s, 1),
                "check": val,
            }
        )
    )


if __name__ == "__main__":
    main()
