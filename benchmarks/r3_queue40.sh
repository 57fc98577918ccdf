#!/bin/bash
# Round-3 TPU job queue #40 — sphere headline regeneration at final HEAD.
#
# r3_3view_sphere_fixed was trained at the intermediate gate (all-True mask
# + K truncation — healthy for the sphere but collapsed the cube, so the
# committed gate is now dense-during-phase). Regenerate the sphere headline
# on the final code path + canonical eval + hermetic mesh-GT chamfer, so
# both headline artifacts (cube 60k in queue39, sphere 20k here) are
# reproducible at HEAD.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue40.pid

if [ -f /tmp/queue39.pid ]; then
  q=$(cat /tmp/queue39.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue40] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue40] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue40] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job sphere_hd timeout 7200 python run.py --synthetic --n_views 3 \
  --probe sphere --steps 20000 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --grid_stats \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --expname r3_3view_sphere_hd

wait_tunnel || exit 1
run_job sphere_hd_eval timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt logs/r3_3view_sphere_hd/last_ckpt.pkl \
  --out_dir logs/r3_3view_sphere_hd/eval_canonical

run_job sphere_hd_meshgt timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt logs/r3_3view_sphere_hd/last_ckpt.pkl --mesh_only --cpu \
  --out_dir logs/r3_3view_sphere_hd/eval_mesh_gt

echo "[queue40] all jobs done $(date +%H:%M:%S)"
