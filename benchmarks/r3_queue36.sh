#!/bin/bash
# Round-3 TPU job queue #36 — maskcache-fix validation.
#
#   V1: sphere probe, FULL queue31 recipe (maskcache + bf16 + warmup) on the
#       fixed code — expect the object branch to adapt (psnr_obj >> 4.5,
#       frac_neg stable) where queue31/sphbi_full drained.
#   V2: cube 20k sanity with the same recipe — expect parity with the
#       established 3-view numbers (R ~0.3-1.1, PSNR ~31-32 at 20k).
#   V3: bench quick — confirm the rays/s proxy is unchanged (mask content
#       cannot change FLOPs; this is the paper trail).
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue36.pid

if [ -f /tmp/queue35.pid ]; then
  q=$(cat /tmp/queue35.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue36] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue36] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue36] === $name done rc=$? $(date +%H:%M:%S)"
}

FLAGS="--steps 20000 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --grid_stats \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"

wait_tunnel || exit 1
run_job sphere_fixed timeout 7200 python run.py --synthetic --n_views 3 \
  --probe sphere $FLAGS --expname r3_3view_sphere_fixed

wait_tunnel || exit 1
run_job cube_fixed_sanity timeout 7200 python run.py --synthetic --n_views 3 \
  $FLAGS --expname r3_3view_cube_fixed

wait_tunnel || exit 1
run_job bench_fixed timeout 3600 python bench.py

echo "[queue36] all jobs done $(date +%H:%M:%S)"
