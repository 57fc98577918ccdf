#!/bin/bash
# Round-3 TPU job queue #30 — noisy-GT protocol science + bench refresh.
#
#   N2: --pose_noise 0.05 (small perturbation) — does the BARF-style joint
#       refinement recover small noise without PnP? (Companion to queue27's
#       0.15 run, which converged to a wrong-pose-consistent scene: R 9.08 /
#       t 36.9 / test PSNR 20.4 — the paper-motivating failure mode.)
#   N3: --pose_noise 0.15 with the pose window left open the whole run —
#       separates "window closed too early" from "3-view photometric/corres
#       refinement cannot recover 0.15 noise at all".
#   B: bench.py at HEAD (superstep default now 100).
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue29.pid ]; then
  q=$(cat /tmp/queue29.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue30] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue30] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue30] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 3view_noise005 timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 2500 --pose_noise 0.05 --pose_window 0.5 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --expname r3_3view_noise005

wait_tunnel || exit 1
run_job 3view_noise_w100 timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 2500 --pose_noise 0.15 --pose_window 1.0 \
  --pose_trans_window 1.0 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --expname r3_3view_noise_w100

wait_tunnel || exit 1
run_job bench10 timeout 3600 python bench.py

echo "[queue30] all jobs done $(date +%H:%M:%S)"
