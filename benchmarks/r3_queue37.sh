#!/bin/bash
# Round-3 TPU job queue #37 — warmup center-anchor validation on the 6-view
# variance seeds.
#
# Queue33 showed the w75 guard recipe at R 0.83 / 2.04 / 2.39 across seeds
# 0/1/2; the spread traces to warmup-injected translation (t -> 20-30 x100)
# that later windows only partially heal. The soft center anchor
# (--warmup_center_anchor 1.0) damps the view-axis excursion while keeping
# the rotation fix. Rerun the two bad seeds; healthy expectation: t at
# activation stays near PnP's (~5), final R <= seed0's 0.83-ish.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue37.pid

if [ -f /tmp/queue36.pid ]; then
  q=$(cat /tmp/queue36.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue37] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue37] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue37] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --warmup_center_anchor 1.0 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"

wait_tunnel || exit 1
run_job 6view_anchor_seed2 timeout 7200 python run.py $BASE6 --seed 2 \
  --expname r3_6view_anchor_seed2

wait_tunnel || exit 1
run_job 6view_anchor_seed1 timeout 7200 python run.py $BASE6 --seed 1 \
  --expname r3_6view_anchor_seed1

echo "[queue37] all jobs done $(date +%H:%M:%S)"
