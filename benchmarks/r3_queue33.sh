#!/bin/bash
# Round-3 TPU job queue #33 — 6-view w75 seed sweep.
#
# The 6-view target-closing run (r3_6view_guard_w75: R 0.83 / t 4.06 /
# PSNR 30.63) is a single seed, and the journal shows per-activation PnP is
# a lottery (queue19's view-4 catastrophic draw). Seeds 1/2 measure the
# recipe's variance the way queue24 did for the 3-view headline.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue33.pid

if [ -f /tmp/queue32.pid ]; then
  q=$(cat /tmp/queue32.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue33] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue33] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue33] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"

wait_tunnel || exit 1
run_job 6view_w75_seed1 timeout 7200 python run.py $BASE6 --seed 1 \
  --expname r3_6view_w75_seed1

wait_tunnel || exit 1
run_job 6view_w75_seed2 timeout 7200 python run.py $BASE6 --seed 2 \
  --expname r3_6view_w75_seed2

echo "[queue33] all jobs done $(date +%H:%M:%S)"
