#!/bin/bash
# Round-3 TPU job queue #7: 6-view dynamics, informed by the r3 instrumentation
# (activation-time rel-pose logging) and the 3-view winner (PSNR 30.10):
#   E4a — the EXACT 3-view winner recipe at 6 views (the missing control:
#         E2r/E3 changed fine_start and object_iters at the same time).
#   E4b — E4a + split pose windows (rotation freezes at 0.5, translation keeps
#         refining to 1.0): fine-phase grads heal t, never touch R.
set -u
cd /root/repo
mkdir -p logs/r3_queue

for i in $(seq 1 400); do
  grep -q "all jobs done" logs/r3_queue/queue6.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue7] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue7] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue7] === $name done rc=$? $(date +%H:%M:%S)"
}

# P2: op-level profile of the early-phase step (object branch = 96.8 of
# 107.8 ms per the early ablation) — runs FIRST so optimization work can
# start while the E4 convergence runs hold the TPU.
wait_tunnel || exit 1
run_job profile_early timeout 3600 python benchmarks/profile_step.py --phase early --iters 8

# E4a: 3-view winner recipe, 6 views
wait_tunnel || exit 1
run_job 6view_winner_recipe timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_warmup 100 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --matmul_dtype bfloat16 \
  --expname r3_6view_winner_recipe --render_test --i_validate 2000 --i_ckpt 5000

# E4b: + split rot/trans pose windows
wait_tunnel || exit 1
run_job 6view_transwindow timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 \
  --expname r3_6view_transwindow --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue7] all jobs done $(date +%H:%M:%S)"
