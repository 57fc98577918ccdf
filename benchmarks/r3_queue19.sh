#!/bin/bash
# Round-3 TPU job queue #19 (queue18 never ran — session restart):
#   W:    microbench_window — decide the (2,2,2) block gather/scatter refactor
#   E4:   6-view rot-only warmup, ungated (warmup can no longer damage t, so
#         run it on every activation; rescues rotation, keeps PnP's camera
#         center — the asymmetric policy from the journal, now enforced in
#         the optimizer instead of healed after the fact)
#   E5:   6-view guard recipe + rot_only (gated variant, fallback)
#   E9/E10: 4-view and 5-view guard runs (view-count breadth, from queue18)
#   B:    bench refresh
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue19] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue19] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue19] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job window timeout 2400 python benchmarks/microbench_window.py

wait_tunnel || exit 1
run_job 6view_rotonly timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_rot_only \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_rotonly --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 6view_guard_rotonly timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 --warmup_rot_only \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_guard_rotonly --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 4view_guard timeout 7200 python run.py --synthetic --n_views 4 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_4view_guard --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 5view_guard timeout 7200 python run.py --synthetic --n_views 5 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_5view_guard --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job bench8 timeout 3600 python bench.py

echo "[queue19] all jobs done $(date +%H:%M:%S)"
