#!/bin/bash
# Round-3 TPU job queue #42 — always-warmup + center-anchor on the 6-view
# variance seeds.
#
# Queue37 showed the anchor fixes warmup t-injection (worst-seed PSNR
# 27.93 -> 30.25) but the px/photo gate now passes rotation-slipped warmups
# (R 2.0/2.4 -> 3.2/3.6). Hypothesis: with the anchor making warmup
# translation-safe, the px gate is pure downside — it skipped the view-5
# warmup seed0 needed and let seed1's bad view-2 one through. Run gate 0
# (warmup ALWAYS runs, accept-if-better guard still on via photo_ratio)
# on seeds 0/1/2. Healthy expectation: R back under ~2 with PSNR >= 30.2.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue42.pid

if [ -f /tmp/queue41.pid ]; then
  q=$(cat /tmp/queue41.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue42] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue42] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue42] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 0 --warmup_photo_ratio 4 \
  --warmup_center_anchor 1.0 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"

wait_tunnel || exit 1
run_job 6view_always_seed0 timeout 7200 python run.py $BASE6 --seed 0 \
  --expname r3_6view_always_seed0

wait_tunnel || exit 1
run_job 6view_always_seed1 timeout 7200 python run.py $BASE6 --seed 1 \
  --expname r3_6view_always_seed1

wait_tunnel || exit 1
run_job 6view_always_seed2 timeout 7200 python run.py $BASE6 --seed 2 \
  --expname r3_6view_always_seed2

echo "[queue42] all jobs done $(date +%H:%M:%S)"
