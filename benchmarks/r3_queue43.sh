#!/bin/bash
# Round-3 TPU job queue #43 — sphere probe with the boundary-shell prior.
#
# Queue38 diagnosed the sphere-probe "filled box" basin: the raw SDF drifts
# negative out to the bbox faces, the deformed+mapped SDF loses its zero
# crossing, and mesh extraction is empty even though pose anchoring works
# (R 0.53 / t 0.70 / PSNR 32.83). Commit 44d5a62 adds a boundary-shell
# positivity prior (relu(margin - sdf) on the outer voxel shell) that is
# exactly zero for healthy geometry and directly blocks the basin. Validate:
# same recipe as the queue36/40 sphere run + --shell_weight 1.0
# --shell_margin 0.05 (~2 voxels at 96^3); success = non-empty mesh with a
# finite probe-surface chamfer and unchanged pose/PSNR.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue43.pid

if [ -f /tmp/queue42.pid ]; then
  q=$(cat /tmp/queue42.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue43] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue43] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue43] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job sphere_shell timeout 7200 python run.py --synthetic --n_views 3 \
  --probe sphere --steps 20000 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --grid_stats \
  --shell_weight 1.0 --shell_margin 0.05 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --expname r3_3view_sphere_shell

wait_tunnel || exit 1
run_job sphere_shell_eval timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt logs/r3_3view_sphere_shell/last_ckpt.pkl \
  --out_dir logs/r3_3view_sphere_shell/eval_canonical

run_job sphere_shell_meshgt timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt logs/r3_3view_sphere_shell/last_ckpt.pkl --mesh_only --cpu \
  --out_dir logs/r3_3view_sphere_shell/eval_mesh_gt

echo "[queue43] all jobs done $(date +%H:%M:%S)"
