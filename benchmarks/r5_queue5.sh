#!/bin/bash
# Round-5 TPU queue #5 — consolidated remainder, priority-ordered, chained
# after queue1. Replaces queues 2-4: the 6-view collapse + its match-guard
# fix re-prioritized everything.
#
# 1. 6view_ba retry at the guarded HEAD (flagship; first attempt aborted by
#    the probe-health invariant when warmup corrupted the poses)
# 2. 3view_classical retry at the guarded HEAD (geometry headline; first
#    attempt's probe spent 1600 steps collapsed before recovering)
# 3. fresh full bench (perf record at the ckpt1-trunk HEAD)
# 4. 6view seed variance
# 5. SuperGlue-integration protocol run (random weights, must not crash)
# 6. perf extras: early HLO dump, window+barrier A/B
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue5.pid

if [ -f /tmp/r5_queue1.pid ]; then
  q=$(cat /tmp/r5_queue1.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r5q5] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q5] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q5] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q5] SKIP $name (tunnel down)"; fi
}

BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"
BASE3="--synthetic --n_views 3 --steps 20000 --object_iters 2500 \
  --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

# 1. flagship retry at the guarded HEAD
tpu_job 6view_ba_retry timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 --expname r5_6view_ba
run_job 6view_ba_mesh timeout 1800 python eval.py --synthetic \
  --n_views 6 --mesh_only --cpu \
  --ckpt logs/r5_6view_ba/last_ckpt.pkl \
  --out_dir logs/r5_6view_ba/eval_mesh_gt

# 1b. hostile-noise retry (verdict #4): the first attempt was destroyed by
#     a degenerate far-field refine acceptance (now bounded) and aborted
#     by the probe-health invariant
tpu_job 3view_noise_real2 timeout 9000 python run.py $BASE3 \
  --res 128 --match_noise_px 0.25 --match_outliers 0.15 \
  --warmup_gate 1 --warmup_rescue 10 --pose_ba 0.25,0.45 \
  --expname r5_3view_noise_real2

# 1c. fresh full bench at this HEAD (early, in case the round ends)
tpu_job bench_r5 timeout 1200 python bench.py

# 2. geometry-headline retry at the guarded HEAD
tpu_job 3view_classical2 timeout 9000 python run.py $BASE3 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 \
  --expname r5_3view_classical2
run_job 3view_classical2_mesh timeout 1800 python eval.py --synthetic \
  --n_views 3 --res 128 --texture noise --mesh_only --cpu \
  --ckpt logs/r5_3view_classical2/last_ckpt.pkl \
  --out_dir logs/r5_3view_classical2/eval_mesh_gt


# 2b. classical 6-view retry at the refine-enabled HEAD (first attempt
#     aborted: degenerate activation PnP killed the probe; the activation
#     match-refine stage now rewrites such poses from the packs)
tpu_job 6view_classical_ba2 timeout 9000 python run.py $BASE6 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --grid_stats --expname r5_6view_classical_ba2

# 4. seed variance
tpu_job 6view_ba_seed1 timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --seed 1 --expname r5_6view_ba_seed1

# 5. SuperGlue integration protocol run (random-init weights)
run_job gen_sgw timeout 900 python benchmarks/gen_superglue_random_weights.py \
  --out /tmp/sgw_r5
tpu_job 3view_superglue timeout 7200 env POSEPROBE_SUPERGLUE_WEIGHTS=/tmp/sgw_r5 \
  python run.py $BASE3 --match_source superglue --texture noise --res 128 \
  --steps 8000 --expname r5_3view_superglue

# 6. perf extras
tpu_job hlo_early2 timeout 1500 python benchmarks/hlo_dump.py --phase early
tpu_job profile_early_winbar timeout 1800 env POSEPROBE_WINDOW_SCATTER=1 \
  POSEPROBE_SCATTER_BARRIER=1 python benchmarks/profile_step.py \
  --phase early --outdir logs/r5_queue/trace_early_winbar

echo "[r5q5] all jobs done $(date +%H:%M:%S)"
