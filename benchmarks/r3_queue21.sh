#!/bin/bash
# Round-3 TPU job queue #21 — exact-f64-metric reconciliation.
#
# core/align.py now computes pose alignment/metrics on host float64 (the
# bf16-pass f32 metric carried ~2deg of arccos-boundary noise and flipped the
# pairwise gauge argmin). Jobs:
#   E1: f64 eval of the 3-view rescue ckpt (headline protocol, exact numbers)
#   E2: f64 eval of the 6view_full ckpt
#   G1: re-run the winning plain-guard 6-view recipe (r3_6view_guard:
#       R 0.028 / t 5.25 / PSNR 31.9 under the noisy metric, no ckpt saved)
#       under the exact metric, with ckpts -> r3_6view_guard_f64.
#       Target: R <= 1.2 / t <= 5 / PSNR >= 29 in one artifact.
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue21] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue21] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue21] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 3view_rescue_f64 timeout 2400 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_rescue/last_ckpt.pkl --no_test_optim \
  --out_dir logs/r3_3view_rescue/eval_f64

wait_tunnel || exit 1
run_job 6view_full_f64 timeout 2400 python eval.py --synthetic --n_views 6 \
  --ckpt logs/r3_6view_full/last_ckpt.pkl --no_test_optim \
  --out_dir logs/r3_6view_full/eval_f64

wait_tunnel || exit 1
run_job 6view_guard_f64 timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_guard_f64 --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue21] all jobs done $(date +%H:%M:%S)"
