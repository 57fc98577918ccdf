"""Microbenchmark: trilinear grid sample fwd+bwd at early-phase scale.

The early-phase profile (logs/profile, 2026_08_17_17_40_42) showed the object
branch's 96.8 ms dominated by the trilerp gather/scatter pairs — worst single
op: the 12-ch k0 grad scatter at 43.8 ms (925,696 point-corner rows into
[96^3, 12] laid out column-major). This measures the pair in isolation so
layout changes can be attributed.

Usage: python benchmarks/microbench_grid.py [--n 925696] [--grid 96]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def bench(fn, *args, iters=10, warmup=3, vary=0):
    """Times fn(*args). `vary` = index of an arg to perturb per iteration so
    the axon relay cannot serve cached executions (CLAUDE.md pitfall — an
    unvaried loop measured 0.04 ms for a 27 ms program)."""
    import jax
    import jax.numpy as jnp

    variants = []
    for i in range(max(iters, warmup)):
        a = list(args)
        a[vary] = a[vary] + jnp.asarray(1e-6 * (i + 1), a[vary].dtype)
        variants.append(a)
    out = None
    for i in range(warmup):
        out = fn(*variants[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*variants[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=925696 // 8)  # points (x8 corners inside)
    ap.add_argument("--grid", type=int, default=96)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the axon hook pins JAX_PLATFORMS=axon)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from poseprobe_tpu.ops import grid as G

    D = args.grid
    N = args.n
    key = jax.random.PRNGKey(0)
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    pts = jax.random.uniform(key, (N, 3))

    for C, tag in [(1, "sdf  C=1 "), (12, "k0   C=12"), (13, "joint C=13")]:
        grid = jax.random.normal(jax.random.PRNGKey(C), (C, D, D, D))

        def loss(g, p):
            return (G.trilinear_sample(g, p, lo, hi) ** 2).sum()

        f = jax.jit(jax.value_and_grad(loss))
        dt = bench(f, grid, pts)
        def loss_vg(g, p):
            v, gr = G.trilinear_sample_with_grad(g, p, lo, hi)
            return (v ** 2).sum() + (gr ** 2).sum()

        fvg = jax.jit(jax.value_and_grad(loss_vg))
        dt_vg = bench(fvg, grid, pts)
        print(f"[{tag}] value fwd+bwd {dt*1e3:7.2f} ms   value+grad fwd+bwd {dt_vg*1e3:7.2f} ms"
              f"  (N={N}, grid={D}^3, {str(jax.devices()[0])})", flush=True)

        # channels-last isolation: explicit gather of [C] rows from a
        # natively row-major [X*Y*Z, C] array, and the explicit scatter-add
        # back — no transpose anywhere in the graph. Tells whether the
        # 12-ch scatter's 43.8 ms (profiled in-step) is layout-bound or
        # index-serialization-bound.
        flat_cl = jnp.asarray(np.moveaxis(np.asarray(grid), 0, -1).reshape(-1, C))
        key2 = jax.random.PRNGKey(C + 100)
        idx = jax.random.randint(key2, (N * 8,), 0, D ** 3 - 1)
        upd = jax.random.normal(key2, (N * 8, C))

        gath = jax.jit(lambda g_flat, i: g_flat[i].sum())
        dt_g = bench(gath, flat_cl, idx)
        scat = jax.jit(lambda i, u: jnp.zeros((D ** 3, C), jnp.float32)
                       .at[i].add(u).sum())
        dt_s = bench(scat, idx, upd, vary=1)
        # lane-padded scatter (one contiguous (8,128) tile row per update)
        # + pallas transpose_slice consumer — the production scatter path
        from poseprobe_tpu.ops.pallas import layout as PL

        def scat_pad(i, u):
            up = jnp.pad(u, ((0, 0), (0, 128 - C)))
            d = jnp.zeros((D ** 3, 128), jnp.float32).at[i].add(up)
            return PL.transpose_slice(d, C).sum()

        dt_sp = bench(jax.jit(scat_pad), idx, upd, vary=1)
        print(f"[{tag}] channels-last explicit: gather {dt_g*1e3:7.2f} ms   "
              f"scatter-add {dt_s*1e3:7.2f} ms   lane-padded scatter "
              f"{dt_sp*1e3:7.2f} ms  ({N*8} rows)", flush=True)


if __name__ == "__main__":
    main()
