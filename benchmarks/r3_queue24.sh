#!/bin/bash
# Round-3 TPU job queue #24 — flagship 60k run, seed variance, dark features.
#
#   F1: 3-view winner recipe at the reference's FULL 60k iteration budget
#       (all schedules are ratio-based, so windows scale with --steps).
#   S1/S2: 3-view winner at seeds 1/2 (20k) — variance of the headline
#       protocol across PnP/init draws.
#   P1: 6-view w75 recipe + progressive grid scaling (pg_scale 800,1600
#       inside the 2.5k object phase; reference default_fine_s.py:70) —
#       first converged run with pg_scale on.
#   T1: 3-view winner with grid_type=tensorf — first converged TensoRF run.
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue23.pid ]; then
  q=$(cat /tmp/queue23.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue24] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue24] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue24] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE3="--synthetic --n_views 3 --object_iters 2500 --pose_window 0.5
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10
  --loss_weight depth_cons=-2 --dc_start 0.25
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"

wait_tunnel || exit 1
run_job 3view_60k timeout 10000 python run.py $BASE3 --steps 60000 \
  --i_ckpt 10000 --expname r3_3view_60k

wait_tunnel || exit 1
run_job 3view_seed1 timeout 7200 python run.py $BASE3 --steps 20000 \
  --i_ckpt 10000 --seed 1 --expname r3_3view_seed1

wait_tunnel || exit 1
run_job 3view_seed2 timeout 7200 python run.py $BASE3 --steps 20000 \
  --i_ckpt 10000 --seed 2 --expname r3_3view_seed2

wait_tunnel || exit 1
run_job 6view_pg timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --pg_scale 800,1600 \
  --expname r3_6view_pg --render_test --i_validate 2000 --i_ckpt 10000

wait_tunnel || exit 1
run_job 3view_tensorf timeout 7200 python run.py $BASE3 --steps 20000 \
  --i_ckpt 10000 --grid_type tensorf --expname r3_3view_tensorf

echo "[queue24] all jobs done $(date +%H:%M:%S)"
