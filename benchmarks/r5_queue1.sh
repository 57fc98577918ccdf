#!/bin/bash
# Round-5 TPU job queue #1 — verdict item #1: regenerate EVERY stale headline
# artifact at the round-5 HEAD (depth-convention fix f298e7f + chord-K
# re-bound 24cc674 + per-view-K BA + pixel-center keypoints + 6-view test
# split with separation floor + default-on probe-health assertion).
#
# Ordering = importance under tunnel-outage risk: the real-matcher 3-view
# (chamfer + depth_abs claims) first, then the analytic 6-view flagship,
# then the rest. Each TPU job individually gated on the tunnel.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue1.pid

# wait for queue0b (perf iteration block) — one TPU process at a time
if [ -f /tmp/r5_queue0b.pid ]; then
  q=$(cat /tmp/r5_queue0b.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 30; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r5q1] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q1] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q1] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q1] SKIP $name (tunnel down)"; fi
}

# round-4 winning recipes, unchanged except the HEAD they run at
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

# 1. real-matcher 3-view (chamfer + depth_abs headline)
tpu_job 3view_classical timeout 9000 python run.py $BASE3 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 \
  --expname r5_3view_classical
run_job 3view_classical_mesh timeout 1800 python eval.py --synthetic \
  --n_views 3 --res 128 --texture noise --mesh_only --cpu \
  --ckpt logs/r5_3view_classical/last_ckpt.pkl \
  --out_dir logs/r5_3view_classical/eval_mesh_gt

# 2. analytic 6-view flagship
tpu_job 6view_ba timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 --expname r5_6view_ba
run_job 6view_ba_mesh timeout 1800 python eval.py --synthetic \
  --n_views 6 --mesh_only --cpu \
  --ckpt logs/r5_6view_ba/last_ckpt.pkl \
  --out_dir logs/r5_6view_ba/eval_mesh_gt

# 3. real-matcher 6-view + BA
tpu_job 6view_classical_ba timeout 9000 python run.py $BASE6 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --grid_stats --expname r5_6view_classical_ba

# 4. 60k flagship on the SAME 20k schedule as round 4 (--schedule_steps pins
#    pose windows/c2f at the r4 protocol; only the polish budget triples)
tpu_job 3view_60k timeout 12000 python run.py $BASE3 \
  --steps 60000 --schedule_steps 20000 \
  --i_ckpt 10000 --grid_stats --expname r5_3view_60k

# 5. hostile noisy-match baseline at this HEAD (verdict #4 reference point;
#    policy-tuned variants follow in queue 2)
tpu_job 3view_noise_real timeout 9000 python run.py $BASE3 \
  --res 128 --match_noise_px 0.25 --match_outliers 0.15 \
  --warmup_gate 1 --warmup_rescue 10 --pose_ba 0.25,0.45 \
  --expname r5_3view_noise_real

echo "[r5q1] all jobs done $(date +%H:%M:%S)"
