"""Measure the axon-relay per-execution overhead floor.

If each jitted execution pays a fixed RPC latency through the TPU tunnel,
that latency bounds steps/sec regardless of kernel speed — and batching K
train steps into one device program (lax.scan) becomes the top lever.

Methodology: time a trivial jitted fn (one tiny matmul) executed in a loop
with a *fresh* input each iteration (the relay caches identical (fn, args)
executions — CLAUDE.md).
"""
import time

import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    x = jnp.eye(8)
    tiny(x).block_until_ready()  # compile

    # vary input each iter to defeat the relay execution cache
    n = 30
    xs = [jnp.eye(8) * (1.0 + i * 1e-3) for i in range(n)]
    for x in xs:
        x.block_until_ready()
    t0 = time.perf_counter()
    for x in xs:
        tiny(x).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"tiny jitted call, blocking: {dt/n*1e3:.2f} ms/call")

    # async dispatch (block only at the end) — measures pipelined throughput
    t0 = time.perf_counter()
    outs = [tiny(x) for x in xs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"tiny jitted call, pipelined: {dt/n*1e3:.2f} ms/call")

    # chained (each call consumes the previous output, like a train loop)
    @jax.jit
    def chain(x):
        return x @ x + 1e-6

    y = jnp.eye(128)
    chain(y).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        y = chain(y)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    print(f"chained jitted call, async: {dt/n*1e3:.2f} ms/call")

    # scan of 8 chained matmuls inside ONE program vs 8 separate calls
    @jax.jit
    def scanned(y):
        def body(c, _):
            return c @ c + 1e-6, ()
        out, _ = jax.lax.scan(body, y, None, length=8)
        return out

    scanned(y).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        y = scanned(y)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    print(f"scan(8) program: {dt/n*1e3:.2f} ms/call -> {dt/n/8*1e3:.2f} ms/step-equivalent")


if __name__ == "__main__":
    main()
