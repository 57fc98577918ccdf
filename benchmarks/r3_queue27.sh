#!/bin/bash
# Round-3 TPU job queue #27 — protocol-coverage converged runs.
#
#   N1: noisy-GT-pose protocol (generic DTU coarse.py:36 camera.noise=0.15,
#       no PnP) — the BARF-style pose-recovery regime, never yet run to
#       convergence on TPU.
#   R1: replica-style protocol (GT-seeded poses, object branch off after one
#       step, scene-only) — exercises the replica preset code path
#       end-to-end on the synthetic scene.
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue26.pid ]; then
  q=$(cat /tmp/queue26.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue27] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue27] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue27] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 3view_noise timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 2500 --pose_noise 0.15 --pose_window 0.5 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --i_ckpt 10000 --expname r3_3view_noise

wait_tunnel || exit 1
run_job 3view_sceneonly timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 1 --no_pnp --pose_window 0.5 \
  --incremental_step 2000 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --render_test --i_validate 2000 \
  --i_ckpt 10000 --expname r3_3view_sceneonly

echo "[queue27] all jobs done $(date +%H:%M:%S)"
