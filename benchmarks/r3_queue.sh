#!/bin/bash
# Round-3 TPU job queue: wait for the axon tunnel, then run the queued jobs
# sequentially (one TPU process at a time). Logs under logs/r3_queue/.
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 200); do
    if probe; then echo "[queue] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}

run_job() {
  local name="$1"; shift
  echo "[queue] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || { echo "[queue] tunnel never came up"; exit 1; }
run_job bench env POSEPROBE_BENCH_FORCE_TPU=1 timeout 3600 python bench.py

wait_tunnel
run_job 6view_sceneanchor timeout 10800 python run.py --synthetic --n_views 6 \
  --steps 20000 --pose_window 0.5 --pnp_anchor scene --matmul_dtype bfloat16 \
  --expname r3_6view_sceneanchor --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel
run_job 3view_narrow timeout 10800 python run.py --synthetic --steps 20000 \
  --object_iters 2500 --pose_window 0.5 --pnp_anchor scene --matmul_dtype bfloat16 \
  --expname r3_3view_narrow --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue] all jobs done $(date +%H:%M:%S)"
