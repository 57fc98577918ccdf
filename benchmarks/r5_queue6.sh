#!/bin/bash
# Round-5 endgame queue: the 6-view flagship with the beta cap (blocks the
# evaporation basin this instance falls into from step ~100), then the
# hostile-noise retry, then a fresh bench — in strict priority order
# against the round clock.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue6.pid

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 60); do
    if probe; then echo "[r5q6] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q6] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q6] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q6] SKIP $name (tunnel down)"; fi
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

tpu_job 6view_ba_cap timeout 5400 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --beta_cap 2.0 --grid_stats --i_ckpt 10000 \
  --expname r5_6view_ba_cap
run_job 6view_ba_cap_mesh timeout 1500 python eval.py --synthetic \
  --n_views 6 --mesh_only --cpu \
  --ckpt logs/r5_6view_ba_cap/last_ckpt.pkl \
  --out_dir logs/r5_6view_ba_cap/eval_mesh_gt

tpu_job 3view_noise_real2 timeout 7200 python run.py $BASE3 \
  --res 128 --match_noise_px 0.25 --match_outliers 0.15 \
  --warmup_gate 1 --warmup_rescue 10 --pose_ba 0.25,0.45 \
  --expname r5_3view_noise_real2

tpu_job bench_r5 timeout 1200 python bench.py

tpu_job 3view_classical2 timeout 9000 python run.py $BASE3 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 \
  --expname r5_3view_classical2

echo "[r5q6] all jobs done $(date +%H:%M:%S)"
