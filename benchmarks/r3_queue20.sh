#!/bin/bash
# Round-3 TPU job queue #20 — the catastrophic-PnP rescue tournament runs.
# Waits for queue19 (pid file /tmp/queue19.pid) before touching the TPU.
#
#   F1: 6-view FULL recipe — guard (gate 8 / photo 4) + rot-only warmup +
#       rescue 10. queue19's ungated rot-only run was lost to one degenerate
#       RANSAC solve (view 4: med_reproj 0.3px yet R 35.4deg / t 126 — outside
#       the warmup basin, run never recovered); the rescue tournament is the
#       backstop for exactly that draw. Target: keep r3_6view_guard's
#       R 0.028 / PSNR 31.9 and pull t 5.25 under 5.
#   F2: 6-view guard + rescue, NO rot-only — isolates the rescue's effect on
#       the winning guard recipe.
#   F3: 3-view winner recipe + rescue — confirm the backstop does not regress
#       the headline protocol (r3_3view_gate_mc: R 0.028 / t 1.10 / PSNR 32.1).
set -u
cd /root/repo
mkdir -p logs/r3_queue

# serialize behind queue19 (one TPU process at a time)
if [ -f /tmp/queue19.pid ]; then
  q19=$(cat /tmp/queue19.pid)
  while kill -0 "$q19" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue20] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue20] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue20] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 6view_full timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --warmup_rot_only --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_full --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 6view_guard_rescue timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_guard_rescue --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 3view_rescue timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_warmup 100 \
  --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_3view_rescue --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue20] all jobs done $(date +%H:%M:%S)"
