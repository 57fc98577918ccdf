#!/bin/bash
# Round-3 TPU job queue #45 — pending validations consolidated (tunnel-outage
# session 2026-08-20 could not run them: the axon relay was down for the
# whole window; see logs/run_journal/README_r3.md "2026-08-20 session").
#
# Order = value per minute:
#   1. queue43 payload: sphere + boundary-shell prior (20k, ~15 min) —
#      validates commit 44d5a62's guard on the geometry that motivated it.
#   2. queue44 payload: 3-view 60k seeds 1,2 (~38 min each) — headline
#      variance at the fixed HEAD.
#   3. queue42 payload: 6-view no-gate anchor probe, seeds 1,2 (20k each).
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue45.pid

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue45] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue45] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue45] === $name done rc=$? $(date +%H:%M:%S)"
}

# --- 1. sphere + shell prior (queue43 payload) ---
wait_tunnel || exit 1
run_job sphere_shell timeout 7200 python run.py --synthetic --n_views 3 \
  --probe sphere --steps 20000 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --grid_stats \
  --shell_weight 1.0 --shell_margin 0.05 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --expname r3_3view_sphere_shell
wait_tunnel || exit 1
run_job sphere_shell_meshgt timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt logs/r3_3view_sphere_shell/last_ckpt.pkl --mesh_only --cpu \
  --out_dir logs/r3_3view_sphere_shell/eval_mesh_gt

# --- 2. 3-view 60k seed sweep (queue44 payload) ---
BASE3="--synthetic --n_views 3 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 10000 \
  --i_ckpt 20000 --steps 60000"
for s in 1 2; do
  wait_tunnel || exit 1
  run_job 3view_60k_seed$s timeout 10000 python run.py $BASE3 --seed $s \
    --expname r3_3view_60k_seed$s
done

# --- 3. 6-view no-gate anchor probe (queue42 payload) ---
BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_photo_ratio 4 \
  --warmup_center_anchor 1.0 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"
for s in 1 2; do
  wait_tunnel || exit 1
  run_job 6view_nogate_seed$s timeout 7200 python run.py $BASE6 --seed $s \
    --expname r3_6view_nogate_seed$s
done

echo "[queue45] all jobs done $(date +%H:%M:%S)"
