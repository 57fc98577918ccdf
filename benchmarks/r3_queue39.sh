#!/bin/bash
# Round-3 TPU job queue #39 — 60k flagship regeneration at the FIXED HEAD.
#
# The canonical 3-view 60k artifact (r3_3view_60k_b: R 0.49 / t 0.65 /
# PSNR 32.25) predates the maskcache plastic-phase gate (commit e9b6320),
# which changes object-phase sample selection (all-True occupancy instead of
# the raw-threshold mask). Regenerate the flagship + canonical eval +
# hermetic mesh-GT chamfer so the headline numbers are exactly reproducible
# at HEAD. Same recipe as queue29 (superstep-100 default).
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue39.pid

if [ -f /tmp/queue38.pid ]; then
  q=$(cat /tmp/queue38.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue39] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue39] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue39] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE3="--synthetic --n_views 3 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

wait_tunnel || exit 1
run_job 3view_60k_c timeout 10000 python run.py $BASE3 --steps 60000 \
  --i_ckpt 10000 --render_train --grid_stats --expname r3_3view_60k_c

wait_tunnel || exit 1
run_job 60k_canonical_c timeout 5400 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_60k_c/last_ckpt.pkl --render_video --eval_mesh \
  --out_dir logs/r3_3view_60k_c/eval_canonical

run_job 60k_meshgt_c timeout 3600 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_60k_c/last_ckpt.pkl --mesh_only --cpu \
  --out_dir logs/r3_3view_60k_c/eval_mesh_gt

echo "[queue39] all jobs done $(date +%H:%M:%S)"
