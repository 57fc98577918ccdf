"""Microbenchmark: per-corner scalar gather/scatter vs (2,2,2) window ops.

The trilerp VJPs currently touch each of the 8 cell corners as its own
gather/scatter row (467k rows/step early-phase). The corners of one point
form a 2x2x2 block, so a window gather (slice_sizes=(2,2,2)) / window
scatter (update_window_dims over a [2,2,2] block) does the same work with
8x fewer index entries and 2-4x fewer memory segments. This measures
whether XLA's TPU gather/scatter emitters actually convert that into time.

Usage: python benchmarks/microbench_window.py [--n 58368] [--grid 96]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def bench(fn, *args, iters=10, warmup=3, vary=0):
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
    ap.add_argument("--n", type=int, default=58368)  # points (1024 rays x 57)
    ap.add_argument("--grid", type=int, default=96)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    D, N = args.grid, args.n
    V = D ** 3
    key = jax.random.PRNGKey(0)
    x0 = jax.random.randint(key, (N,), 0, D - 1)
    y0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, D - 1)
    z0 = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, D - 1)
    base = (x0 * D + y0) * D + z0
    offs = jnp.asarray([0, 1, D, D + 1, D * D, D * D + 1, D * D + D, D * D + D + 1])
    idx8 = (base[:, None] + offs[None, :]).reshape(-1)
    starts3 = jnp.stack([x0, y0, z0], -1)  # [N, 3]

    grid1 = jax.random.normal(jax.random.PRNGKey(3), (D, D, D))
    upd1 = jax.random.normal(jax.random.PRNGKey(4), (N, 8))

    # ---- C=1 gather: scalar rows vs (2,2,2) windows
    g_scal = jax.jit(lambda g, i: g.reshape(-1)[i].sum())
    dt = bench(g_scal, grid1, idx8)
    gdn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                     collapsed_slice_dims=(),
                                     start_index_map=(0, 1, 2))

    def g_win(g, s):
        out = lax.gather(g, s, gdn, slice_sizes=(2, 2, 2),
                         mode=lax.GatherScatterMode.CLIP)
        return out.sum()

    dt_w = bench(jax.jit(g_win), grid1, starts3, vary=0)  # vary=0 -> grid varies
    print(f"[C=1 ] gather: scalar x8 {dt*1e3:7.2f} ms   window(2,2,2) {dt_w*1e3:7.2f} ms"
          f"  (N={N}, grid={D}^3, {str(jax.devices()[0])})", flush=True)

    # ---- C=1 scatter: scalar rows vs (2,2,2) windows
    s_scal = jax.jit(lambda i, u: jnp.zeros((V,), jnp.float32).at[i].add(u.reshape(-1)).sum())
    dt = bench(s_scal, idx8, upd1, vary=1)
    sdn = lax.ScatterDimensionNumbers(update_window_dims=(1, 2, 3),
                                      inserted_window_dims=(),
                                      scatter_dims_to_operand_dims=(0, 1, 2))

    def s_win(s, u):
        out = lax.scatter_add(jnp.zeros((D, D, D), jnp.float32), s,
                              u.reshape(N, 2, 2, 2), sdn,
                              mode=lax.GatherScatterMode.CLIP)
        return out.sum()

    dt_w = bench(jax.jit(s_win), starts3, upd1, vary=1)
    print(f"[C=1 ] scatter: scalar x8 {dt*1e3:7.2f} ms   window(2,2,2) {dt_w*1e3:7.2f} ms", flush=True)

    # ---- C=13->128 lane-padded: row scatter vs (2,2,2,128) window scatter
    P = 128
    updP = jax.random.normal(jax.random.PRNGKey(5), (N, 8, P))
    s_row = jax.jit(lambda i, u: jnp.zeros((V, P), jnp.float32).at[i].add(u.reshape(-1, P)).sum())
    dt = bench(s_row, idx8, updP, vary=1)
    sdnP = lax.ScatterDimensionNumbers(update_window_dims=(1, 2, 3, 4),
                                       inserted_window_dims=(),
                                       scatter_dims_to_operand_dims=(0, 1, 2))

    def s_winP(s, u):
        out = lax.scatter_add(jnp.zeros((D, D, D, P), jnp.float32), s,
                              u.reshape(N, 2, 2, 2, P), sdnP,
                              mode=lax.GatherScatterMode.CLIP)
        return out.sum()

    dt_w = bench(jax.jit(s_winP), starts3, updP, vary=1)
    print(f"[C=128] scatter: row x8 {dt*1e3:7.2f} ms   window(2,2,2,128) {dt_w*1e3:7.2f} ms", flush=True)

    # ---- C=13 gather: row gather vs (2,2,2,13) window gather
    C = 13
    gridC = jax.random.normal(jax.random.PRNGKey(6), (D, D, D, C))
    g_row = jax.jit(lambda g, i: g.reshape(-1, C)[i].sum())
    dt = bench(g_row, gridC, idx8)
    gdnC = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3, 4),
                                      collapsed_slice_dims=(),
                                      start_index_map=(0, 1, 2))

    def g_winC(g, s):
        out = lax.gather(g, s, gdnC, slice_sizes=(2, 2, 2, C),
                         mode=lax.GatherScatterMode.CLIP)
        return out.sum()

    dt_w = bench(jax.jit(g_winC), gridC, starts3, vary=0)
    print(f"[C=13] gather: row x8 {dt*1e3:7.2f} ms   window(2,2,2,13) {dt_w*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
