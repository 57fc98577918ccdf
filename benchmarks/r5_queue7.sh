#!/bin/bash
# Round-5 final queue: 6-view flagship at seed 1 (the round-5 seed-0 data
# instance is in the evaporation basin from step ~100 regardless of pose
# quality — beta cap slowed but did not stop the drain; r4 evidence says
# the basin is instance-dependent), then bench.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue7.pid
probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 30); do
    if probe; then echo "[r5q7] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q7] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q7] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q7] SKIP $name (tunnel down)"; fi
}
BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 10000"

tpu_job 6view_ba_seed1 timeout 4500 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --seed 1 --grid_stats --expname r5_6view_ba_seed1
tpu_job bench_r5 timeout 1200 python bench.py
echo "[r5q7] all jobs done $(date +%H:%M:%S)"
