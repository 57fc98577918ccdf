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
import os
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 4096.0  # see module docstring

# Last committed TPU v5e measurement (PERFORMANCE.md `bench_chord`,
# 2026-08-20, maskcache-correct HEAD). Used ONLY as a clearly-labeled
# fallback when the TPU tunnel is down or the wall-clock deadline cuts a
# phase: any value derived from these carries "measured": false or a
# per-phase "phases_measured" list so a stale number can never pass as
# fresh (round-3 verdict #1).
COMMITTED_TPU = {
    "value": 46071.2,
    "early_ms": 48.63,
    "coarse_ms": 6.72,
    "mid_ms": 24.19,
    "source": "PERFORMANCE.md round-5 full-fresh bench 2026-08-21 (TPU v5e)",
}

# Workload constants shared by build_trainer() and the provisional/fallback
# result lines (BASELINE.md scale: 96^3 grid, 1024+1024 rays, 128+128
# samples, 60k schedule). The provisional lines previously hard-coded these
# separately and would silently drift if the config changed (round-4 advisor).
N_ITERS = 10000          # object-phase length
MAX_ITER = 60000         # scene schedule length
FINE_START_RATIO = 0.3   # fine sampling + depth_cons onset
OBJ_RAYS = 1024
SCENE_RAYS = 1024


def default_cfg_phases():
    """(n_iters, fine_start, max_iter, obj_rays, scene_rays) at full scale."""
    return (N_ITERS, int(MAX_ITER * FINE_START_RATIO), MAX_ITER,
            OBJ_RAYS, SCENE_RAYS)


def _emit(result: dict) -> None:
    """Print one JSON line and flush immediately.

    The driver captures the tail of stdout; emitting after every phase means
    a mid-run kill (rc=124) still leaves a parseable, honestly-labeled line
    (round-3 verdict: BENCH_r03.json had rc=124 with an EMPTY tail)."""
    print(json.dumps(result), flush=True)


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
        # fix_first_pose=True keeps the exact production train-step program
        # (PnP-mode gauge fixing); use_pnp=False only skips the PnP INIT
        # compile chain, which is off the timed path and cost ~2 min of
        # bench wall-clock against the driver's capture window.
        camera=cfg_mod.CameraConfig(incremental=True, incremental_step=800,
                                    barf_c2f=(0.6, 1.0), fix_first_pose=True),
        pnp=cfg_mod.PnPConfig(use_pnp=False),
        object_model=ObjectConfig(
            xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
            num_voxels=grid**3, num_voxels_base=grid**3,
            N_iters=N_ITERS, world_bound_scale=1.25,
            use_maskcache=True),  # free-space skipping, on in the DTU presets
        object_train=cfg_mod.ObjectTrainConfig(N_iters=N_ITERS,
                                               N_rand=256 if small else OBJ_RAYS),
        scene_model=SceneConfig(
            rand_rays=256 if small else SCENE_RAYS,
            sample_intvs=32 if small else 128,
            sample_intvs_fine=32 if small else 128,
            max_iter=MAX_ITER, fine_sampling=True,
            ratio_start_fine_sampling_at_x=FINE_START_RATIO,
            matmul_dtype=matmul_dtype),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=MAX_ITER),
    )
    return JointTrainer(cfg, data)


def _tpu_reachable(timeout_s: int = 75, attempts: int = 2) -> bool:
    """Probe the TPU in a subprocess: a dead tunnel hangs jax init forever.

    Total budget <=160 s: round 3's 4x150s probe ladder burned ~11.5 minutes
    before the first compile and timed out the driver's capture window
    (BENCH_r03.json rc=124). Two short attempts (a healthy probe answers in
    <7 s; one retry absorbs a transient tunnel-holder race, observed when
    another process's jax import overlapped the probe) — then demote to the
    labeled-fallback path instead of hanging: the fallback is visible, a
    timeout is not.
    """
    import subprocess

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
            time.sleep(10)
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


def _weighted(cfg_phases, times_s):
    """60k-weighted rays/s from per-phase seconds/step.

    cfg_phases = (n_iters, fine_start, max_iter, obj_rays, scene_rays)."""
    n_iters, fine_start, max_iter, obj_rays, scene_rays = cfg_phases
    steps = np.array([n_iters, fine_start - n_iters, max_iter - fine_start], float)
    times = np.asarray(times_s, float)
    rays = np.array([obj_rays + scene_rays, scene_rays, scene_rays], float)
    total_time = float((steps * times).sum())
    total_rays = float((steps * rays).sum())
    return total_rays / total_time, total_time


def _result_line(cfg_phases, times_s, measured, extra):
    """Build the JSON result dict; unmeasured phases use COMMITTED_TPU values
    and are excluded from `phases_measured` so the provenance is explicit."""
    n_iters, fine_start, max_iter, obj_rays, scene_rays = cfg_phases
    wrps, total_time = _weighted(cfg_phases, times_s)
    t_early, t_coarse, t_mid = times_s
    result = {
        "metric": "joint_train_rays_per_sec_60k_weighted",
        "value": round(wrps, 1),
        "unit": "rays/s",
        "vs_baseline": round(wrps / REFERENCE_RAYS_PER_SEC, 3),
        "early_ms": round(t_early * 1e3, 2),
        "coarse_ms": round(t_coarse * 1e3, 2),
        "mid_ms": round(t_mid * 1e3, 2),
        "early_rays_per_sec": round((obj_rays + scene_rays) / t_early, 1),
        "mid_rays_per_sec": round(scene_rays / t_mid, 1),
        "steps_per_sec_weighted": round(max_iter / total_time, 3),
        "est_60k_run_minutes": round(total_time / 60.0, 1),
        "phases_measured": measured,
        # time-to-PSNR from the latest committed convergence artifact on this
        # device class (logs/r3_3view_gate_mc: 3-view protocol, 20k steps,
        # TPU v5e): test PSNR 32.12 / SSIM 0.973 in 22.2 wall-clock minutes.
        # SPARF-class CUDA joint training needs hours for the same protocol.
        "time_to_psnr30_3view_minutes": 22.2,
        # the 4096 rays/s denominator is the builder's documented PROXY for
        # SPARF-class CUDA throughput (module docstring), not a measurement
        # of the reference, which publishes no numbers (BASELINE.json).
        "baseline_is_proxy": True,
    }
    if len(measured) < 3:
        result["note"] = ("phases %s use the last committed TPU values (%s), "
                          "not fresh measurements" % (
                              sorted(set(["early", "coarse", "mid"]) - set(measured)),
                              COMMITTED_TPU["source"]))
    result.update(extra)
    return result


def main(small: bool = False, warmup: int = 3, iters: int = 20,
         matmul_dtype: str = "bfloat16"):
    t_wall0 = time.time()
    # Total wall-clock budget: emit whatever is measured by the deadline and
    # exit 0 instead of letting the driver's capture window expire (round-3
    # verdict #1). Checked between phases, not preemptively.
    # Budget: probe ~10 s + build ~1 min + ~3-6 min remote compile per phase.
    # Checked BETWEEN phases — mid (70% of a real run) measures first, early
    # second (together 96.5% of weighted wall-clock), coarse (3.5%) last, so
    # a cut loses the least informative phase first.
    deadline_s = float(os.environ.get("POSEPROBE_BENCH_DEADLINE_S", "660"))

    # Persistent compilation cache: repeated bench runs (and the driver's
    # end-of-round run) skip recompiles when the relay supports it; harmless
    # no-op otherwise.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

    # 100-step scan windows measured fastest (44.3k rays/s vs 43.1k at 25 —
    # pure dispatch amortization, numerically identical; logs/r3_queue/
    # bench_ss50.log, bench_ss100.log). Real runs clamp windows to event/log
    # boundaries anyway (trainer.fit), so this is the same execution path.
    superstep = int(os.environ.get("POSEPROBE_SUPERSTEP", "100"))

    force = os.environ.get("POSEPROBE_BENCH_FORCE_TPU", "") == "1"
    fallback = False
    if os.environ.get("POSEPROBE_BENCH_CPU", "") == "1":
        # explicit CPU validation mode (e.g. while another process owns the
        # TPU tunnel — one process at a time, CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
        small = True
    elif (not force and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
            and not _tpu_reachable()):
        # The tunneled TPU is down. FIRST emit the labeled fallback line so
        # the driver always captures a parseable result, THEN cross-check on
        # CPU at reduced workload if the deadline allows.
        fallback = True
        committed = [COMMITTED_TPU["early_ms"] / 1e3,
                     COMMITTED_TPU["coarse_ms"] / 1e3,
                     COMMITTED_TPU["mid_ms"] / 1e3]
        cfg_phases = default_cfg_phases()
        _emit(_result_line(cfg_phases, committed, [], {
            "tpu_unreachable": True,
            "measured": False,
            "device": "unreachable (last committed: TPU v5e)",
            "note": ("TPU tunnel unreachable after 2 probe attempts x 75 s; "
                     "value is the last committed TPU measurement (%s), NOT "
                     "fresh. CPU cross-check follows if the deadline allows."
                     % COMMITTED_TPU["source"]),
        }))
        if time.time() - t_wall0 > deadline_s - 240:
            return None
        import jax

        jax.config.update("jax_platforms", "cpu")
        small = True
    import jax

    if small:
        # CPU-class workload: minimal timing footprint — XLA:CPU compiles of
        # the joint step take minutes each; one warm call and a short window
        # are plenty for a smoke-level cross-check.
        superstep = min(superstep, 10)
        warmup, iters = 1, 10
    elif not fallback:
        # TPU path: provisional line BEFORE the first (slow, remote) compile
        # so even a capture-window kill mid-compile leaves a labeled tail.
        committed0 = [COMMITTED_TPU["early_ms"] / 1e3,
                      COMMITTED_TPU["coarse_ms"] / 1e3,
                      COMMITTED_TPU["mid_ms"] / 1e3]
        _emit(_result_line(default_cfg_phases(), committed0, [], {
            "partial": True, "measured": False,
            "note": ("provisional pre-compile line; all phases are the last "
                     "committed TPU values (%s)" % COMMITTED_TPU["source"]),
        }))

    trainer = build_trainer(small=small, matmul_dtype=matmul_dtype)
    key = jax.random.PRNGKey(0)

    cfg = trainer.cfg
    n_iters = cfg.object_train.N_iters            # 10k: object-branch cutoff
    fine_start = trainer.fine_start               # 18k: fine + depth_cons on
    max_iter = cfg.scene_train.max_iter           # 60k
    obj_rays = cfg.object_train.N_rand
    scene_rays = cfg.scene_model.rand_rays
    cfg_phases = (n_iters, fine_start, max_iter, obj_rays, scene_rays)

    committed = [COMMITTED_TPU["early_ms"] / 1e3,
                 COMMITTED_TPU["coarse_ms"] / 1e3,
                 COMMITTED_TPU["mid_ms"] / 1e3]
    device = str(jax.devices()[0])
    common = {"matmul_dtype": matmul_dtype, "superstep": superstep,
              "maskcache": True, "device": device}
    if fallback:
        common["tpu_unreachable"] = True
        common["note_device"] = ("CPU fallback at reduced workload — NOT TPU "
                                 "throughput; headline fields mix CPU-measured "
                                 "phases with committed TPU values, see "
                                 "phases_measured")

    # Phase order mid -> early -> coarse: mid covers 70% of a real run, so a
    # deadline cut after one phase still leaves the dominant regime measured.
    times = list(committed)
    measured: list = []
    t_mid, loss_mid, key = _time_phase(trainer, fine_start + 1, warmup, iters,
                                       key, superstep=superstep)
    times[2] = t_mid
    measured.append("mid")
    _emit(_result_line(cfg_phases, times, measured,
                       dict(common, loss=loss_mid, partial=True)))
    loss = loss_mid
    if time.time() - t_wall0 < deadline_s:
        t_early, loss_early, key = _time_phase(trainer, 1, warmup, iters, key,
                                               superstep=superstep)
        times[0] = t_early
        measured.append("early")
        loss = loss_mid if np.isfinite(loss_mid) else loss_early
        _emit(_result_line(cfg_phases, times, measured,
                           dict(common, loss=loss, partial=True)))
    if time.time() - t_wall0 < deadline_s:
        t_coarse, _, key = _time_phase(trainer, n_iters + 1, warmup, iters, key,
                                       superstep=superstep)
        times[1] = t_coarse
        measured.append("coarse")
    result = _result_line(cfg_phases, times, measured, dict(common, loss=loss))
    result["bench_wall_clock_s"] = round(time.time() - t_wall0, 1)
    _emit(result)
    return result


if __name__ == "__main__":
    dtype = "bfloat16"
    if "--f32" in sys.argv:
        dtype = "float32"
    main(small="--small" in sys.argv, matmul_dtype=dtype)
