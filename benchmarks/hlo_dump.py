"""Dump the optimized HLO of the joint train step for fusion attribution.

The trace viewer gives per-fusion times (`trace_top.py`) but only names
(fusion.51 ...); this dumps the compiled executable's optimized HLO so each
fusion.N can be mapped to the ops it contains. Pair with a trace from the
same HEAD/phase.

Usage: python benchmarks/hlo_dump.py [--phase early|mid] [--out FILE]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="early", choices=["early", "mid"])
    ap.add_argument("--out", default="")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_trainer

    trainer = build_trainer(small=args.small)
    if args.phase == "mid":
        trainer.state.step = max(trainer.fine_start, trainer.depth_cons_start, 1)
    else:
        trainer.state.step = 1
    state = trainer.state
    flags = trainer.phase_flags(state.step)
    state_tuple = (state.obj_params, state.scene_params, state.pose_params,
                   state.opt_obj, state.opt_scene, state.opt_pose,
                   state.poses_pnp)
    rng = jax.random.PRNGKey(0)
    # the jit wrapper's .lower does not run the method descriptor binding,
    # so `self` must be passed explicitly (it is a static argnum)
    lowered = trainer._train_step.lower(
        trainer, state_tuple, rng, jnp.asarray(state.step, jnp.int32),
        trainer.mask_arr, mask_k=trainer._mask_k, **flags)
    txt = lowered.compile().as_text()
    out = args.out or f"logs/r5_queue/hlo_{args.phase}.txt"
    with open(out, "w") as f:
        f.write(txt)
    n_fus = txt.count("fusion.")
    print(f"[hlo] wrote {out}: {len(txt)} bytes, ~{n_fus} fusion refs")


if __name__ == "__main__":
    main()
