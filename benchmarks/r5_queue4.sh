#!/bin/bash
# Round-5 TPU queue #4 — retry of the analytic 6-view flagship at the
# match-guarded HEAD: the first attempt collapsed (probe evaporation) when
# the activation warmup corrupted near-exact PnP poses (photometric mse
# preferred the wrong pose; the new match-anchor guard rejects that), and
# the default-on probe-health invariant aborted the run as designed.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue4.pid

if [ -f /tmp/r5_queue3.pid ]; then
  q=$(cat /tmp/r5_queue3.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r5q4] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q4] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q4] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q4] SKIP $name (tunnel down)"; fi
}

BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

tpu_job 6view_ba_retry timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 --expname r5_6view_ba
run_job 6view_ba_mesh_retry timeout 1800 python eval.py --synthetic \
  --n_views 6 --mesh_only --cpu \
  --ckpt logs/r5_6view_ba/last_ckpt.pkl \
  --out_dir logs/r5_6view_ba/eval_mesh_gt

echo "[r5q4] all jobs done $(date +%H:%M:%S)"
