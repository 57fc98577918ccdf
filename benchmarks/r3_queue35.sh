#!/bin/bash
# Round-3 TPU job queue #35 — sphere-collapse bisect at the run.py level.
#
# Queue34's isolated object-phase replay (debug_probe_collapse, default
# config) RECOVERS from the beta-collapse transient (psnr_obj 26.5 by step
# 400) — so the drain needs one of queue31's extra flags. Replay the exact
# queue31 recipe with --grid_stats (raw-grid stats in metrics.jsonl), then
# peel suspects one at a time: --maskcache (occupancy cache built from the
# cube-init grid at step 0 and rebuilt during the flat-beta transient),
# --matmul_dtype bfloat16 (scene MLP only, controls pose dynamics), pose
# warmup/rescue machinery.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue35.pid

if [ -f /tmp/queue34.pid ]; then
  q=$(cat /tmp/queue34.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue35] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue35] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue35] === $name done rc=$? $(date +%H:%M:%S)"
}

# queue31's exact recipe, truncated to the object phase + margin
BASE="--synthetic --n_views 3 --probe sphere --steps 3000 --object_iters 2500 \
  --pose_window 0.5 --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --grid_stats --i_print 100 \
  --i_validate 0 --i_ckpt 0"

wait_tunnel || exit 1
run_job sphbi_full timeout 3000 python run.py $BASE \
  --matmul_dtype bfloat16 --maskcache --expname sphbi_full

wait_tunnel || exit 1
run_job sphbi_nomask timeout 3000 python run.py $BASE \
  --matmul_dtype bfloat16 --expname sphbi_nomask

wait_tunnel || exit 1
run_job sphbi_nobf16 timeout 3000 python run.py $BASE \
  --maskcache --expname sphbi_nobf16

wait_tunnel || exit 1
run_job sphbi_nowarm timeout 3000 python run.py --synthetic --n_views 3 \
  --probe sphere --steps 3000 --object_iters 2500 --pose_window 0.5 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --grid_stats --i_print 100 \
  --i_validate 0 --i_ckpt 0 \
  --matmul_dtype bfloat16 --maskcache --expname sphbi_nowarm

echo "[queue35] all jobs done $(date +%H:%M:%S)"
