#!/bin/bash
# Round-3 TPU job queue #28 — 6-view winner at the reference's FULL budget.
#
#   F6: the 6-view w75 guard recipe at 150k steps (define_trainer.py:48-49:
#       6-view runs train 150k iterations). All schedules are ratio-based,
#       so the windows scale with --steps.
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue27.pid ]; then
  q=$(cat /tmp/queue27.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue28] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue28] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue28] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 6view_150k timeout 10800 python run.py --synthetic --n_views 6 \
  --steps 150000 --object_iters 2500 --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_150k --render_test --i_validate 5000 --i_ckpt 25000

echo "[queue28] all jobs done $(date +%H:%M:%S)"
