"""Per-component step-time ablation on the DTU-scale joint workload.

Answers "where do the 115 ms go?" (PERFORMANCE.md): builds one JointTrainer
per variant with a component disabled (or an optimization enabled), times the
jitted step, and prints a table. Each variant is its own compiled program and
every step folds a fresh PRNGKey, so the axon relay cannot serve cached
executions (CLAUDE.md pitfall).

Usage: python benchmarks/ablate.py [--small] [--iters 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def build(variant: str, small: bool):
    import jax

    from bench import build_trainer
    from poseprobe_tpu.models import object_sdf as _osdf

    # PRNG impl is sticky per created key: reset to the default unless this
    # variant asks for the fast TPU generator (threefry splits cost ~1 ms
    # each on v5e — profiled as u32 kLoop fusions)
    jax.config.update("jax_default_prng_impl",
                      "unsafe_rbg" if variant == "rbg" else "threefry2x32")

    # undo a previous variant's monkeypatch (variants run sequentially in one
    # process; see "no_deform")
    if hasattr(_osdf, "_ablate_orig_render"):
        _osdf.render = _osdf._ablate_orig_render
    from poseprobe_tpu.losses import object as _olosses0

    if hasattr(_olosses0, "_ablate_orig_losses"):
        _olosses0.object_losses = _olosses0._ablate_orig_losses

    trainer = build_trainer(small=small)
    cfg = trainer.cfg
    ot, om, sc = cfg.object_train, cfg.object_model, cfg.scene_train
    if variant == "baseline":
        return trainer
    if variant == "no_corres":
        lw = tuple((k, None if k == "corres" else v) for k, v in sc.loss_weight)
        sc = dataclasses.replace(sc, loss_weight=lw)
    elif variant == "no_depth_cons":
        sc = dataclasses.replace(sc, start_ratio_depth_cons=None)
    elif variant == "no_proj":
        ot = dataclasses.replace(ot, projection_dis_error=0.0)
    elif variant == "no_tv":
        ot = dataclasses.replace(ot, weight_tv_density=0.0, weight_tv_k0=0.0)
    elif variant == "no_object":
        ot = dataclasses.replace(ot, N_iters=0)
    elif variant == "no_fine":
        sm = dataclasses.replace(cfg.scene_model, fine_sampling=False)
        cfg = dataclasses.replace(cfg, scene_model=sm)
    elif variant == "bf16":
        sm = dataclasses.replace(cfg.scene_model, matmul_dtype="bfloat16")
        cfg = dataclasses.replace(cfg, scene_model=sm)
    elif variant == "no_fused":
        sm = dataclasses.replace(cfg.scene_model, use_fused_trunk=False)
        cfg = dataclasses.replace(cfg, scene_model=sm)
    elif variant == "no_deform":
        # force use_deform=False through the trainer's hardcoded call site:
        # isolates the SIREN warp + forward-mode Jacobian cost
        from poseprobe_tpu.losses import object as _olosses

        _osdf._ablate_orig_render = _orig = _osdf.render
        _olosses._ablate_orig_losses = _origl = _olosses.object_losses

        def _render_no_deform(*a, **k):
            k["use_deform"] = False
            return _orig(*a, **k)

        def _losses_no_deform(*a, **k):
            k["use_deform"] = False
            return _origl(*a, **k)

        _osdf.render = _render_no_deform
        _olosses.object_losses = _losses_no_deform
    elif variant == "stepsize3":
        om = dataclasses.replace(om, stepsize=3.0)  # half the ray samples
    elif variant == "obj_rand512":
        ot = dataclasses.replace(ot, N_rand=512)  # half the object rays
    elif variant == "grid64":
        om = dataclasses.replace(om, num_voxels=64**3, num_voxels_base=64**3)
    elif variant == "no_smooth":
        om = dataclasses.replace(om, smooth_ksize=0)
    elif variant == "maskcache":
        om = dataclasses.replace(om, use_maskcache=True, maskcache_thres=0.1,
                                 maskcache_keep=0.5)
    elif variant == "pallas":
        om = dataclasses.replace(om, use_pallas_composite=True)
    elif variant == "maskcache+pallas":
        om = dataclasses.replace(om, use_maskcache=True, maskcache_thres=0.1,
                                 maskcache_keep=0.5, use_pallas_composite=True)
    elif variant == "rbg":
        pass  # handled above (default PRNG impl switch)
    elif variant == "tensorf":
        om = dataclasses.replace(om, grid_type="tensorf")
    else:
        raise ValueError(variant)
    cfg = dataclasses.replace(cfg, object_train=ot, object_model=om, scene_train=sc)
    from poseprobe_tpu.train.trainer import JointTrainer

    return JointTrainer(cfg, trainer.data)


def time_variant(variant: str, small: bool, warmup: int, iters: int,
                 phase: str = "mid") -> float:
    import jax

    trainer = build(variant, small)
    if phase == "mid":
        # fine sampling + depth_cons on, object branch over (70% of a run)
        trainer.state.step = max(trainer.fine_start, trainer.depth_cons_start, 1)
    else:
        # early phase: object branch + coarse-only scene + corres (what
        # bench.py's headline measures)
        trainer.state.step = 1
    key = jax.random.PRNGKey(0)
    m = None
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        m = trainer.step_once(sub)
    jax.block_until_ready(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        m = trainer.step_once(sub)
    jax.block_until_ready(m["loss_total"])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--phase", type=str, default="mid", choices=["early", "mid"])
    args = ap.parse_args()

    variants = args.variants.split(",") if args.variants else [
        "baseline", "no_corres", "no_depth_cons", "no_proj", "no_tv",
        "no_object", "no_fine", "maskcache", "pallas", "maskcache+pallas",
    ]
    results = {}
    base = None
    for v in variants:
        try:
            dt = time_variant(v, args.small, args.warmup, args.iters, phase=args.phase)
        except Exception as e:  # keep going: one broken variant must not kill the A/B
            print(f"{v:18s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            results[v] = None
            continue
        results[v] = dt
        if v == "baseline":
            base = dt
        delta = f" ({(dt - base) * 1e3:+7.2f} ms vs base)" if base and v != "baseline" else ""
        print(f"{v:18s} {dt * 1e3:8.2f} ms/step{delta}", flush=True)
    print(json.dumps({k: (round(v * 1e3, 2) if v else None) for k, v in results.items()}))


if __name__ == "__main__":
    main()
