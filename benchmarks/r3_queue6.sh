#!/bin/bash
# Round-3 TPU job queue #6 (replaces the tail of queue4 + queue5, reordered):
# the 6-view dynamics experiment (E3: object_scaled PnP anchors) goes FIRST,
# then the perf decomposition jobs.
set -u
cd /root/repo
mkdir -p logs/r3_queue

# wait for the in-flight 6view_warmup run (PID passed as $1) to release the TPU
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue6] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue6] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue6] === $name done rc=$? $(date +%H:%M:%S)"
}

# E3: 6-view, object_scaled anchors (probe geometry, scene gauge) + warmup.
# Identical to E2r except --pnp_anchor, for a clean A/B on the t-injection.
wait_tunnel || exit 1
run_job 6view_objscaled timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --pose_window 0.5 --fine_start 0.5 --pose_warmup 100 \
  --pnp_anchor object_scaled --matmul_dtype bfloat16 \
  --expname r3_6view_objscaled --render_test --i_validate 2000 --i_ckpt 5000

# A1r: early-phase ablation in the object-active regime (where do 107ms go?)
wait_tunnel || exit 1
run_job ablate_early timeout 5400 python benchmarks/ablate.py --iters 15 \
  --phase early --variants baseline,no_tv,no_proj,no_object,no_corres,maskcache,pallas,maskcache+pallas

# M1r: isolated fused-trunk timing + on-TPU parity assert (import-path fixed)
wait_tunnel || exit 1
run_job microbench_trunk timeout 1800 python benchmarks/microbench_trunk.py

# A2: mid-phase decomposition with the fused trunk A/B
wait_tunnel || exit 1
run_job ablate_mid timeout 5400 python benchmarks/ablate.py --iters 15 \
  --phase mid --variants baseline,no_fused,no_corres,no_depth_cons,no_fine

# P1: op-level trace of the mid-phase step
wait_tunnel || exit 1
run_job profile_mid timeout 3600 python benchmarks/profile_step.py --phase mid --iters 8

echo "[queue6] all jobs done $(date +%H:%M:%S)"
