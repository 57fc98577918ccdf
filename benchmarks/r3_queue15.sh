#!/bin/bash
# Round-3 TPU job queue #15: waits for queue13 to drain, then
#   B1:  bench with POSEPROBE_SUPERSTEP=1 (dispatch-overhead A/B vs queue13's
#        superstep=25 bench5)
#   R:   relay_overhead microbench (per-call latency floor)
#   E6:  6-view gated-warmup + PHOTOMETRIC GUARD run — the fix for queue13's
#        6view_gate miss (view-5 PnP passed the px gate at 0.4px but was
#        R 6.77deg / t 27 off; the photo gate re-arms warmup for such poses
#        and accepts the result only if it scores better). Targets
#        R<=1.2 t<=5 PSNR>=29.
#   E6r: same + mid-training re-registration at 0.45 (snaps residual t).
set -u
cd /root/repo
mkdir -p logs/r3_queue

# wait for queue13's bash (and any child python) to exit
if [ -f /tmp/queue13.pid ]; then
  q13=$(cat /tmp/queue13.pid)
  while kill -0 "$q13" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue15] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue15] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue15] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job bench5_nostack bash -c "POSEPROBE_SUPERSTEP=1 timeout 3600 python bench.py"

wait_tunnel || exit 1
run_job relay_overhead timeout 1200 python benchmarks/relay_overhead.py

wait_tunnel || exit 1
run_job 6view_guard timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_guard --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 6view_guard_rereg timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 --reregister 0.45 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_guard_rereg --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue15] all jobs done $(date +%H:%M:%S)"
