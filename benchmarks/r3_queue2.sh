#!/bin/bash
# Round-3 TPU job queue #2: re-registration experiments + early-phase ablation.
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue2] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}

run_job() {
  local name="$1"; shift
  echo "[queue2] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue2] === $name done rc=$? $(date +%H:%M:%S)"
}

# E1: 6-view, reference object-anchor PnP + mid-training re-registration
wait_tunnel || exit 1
run_job 6view_rereg timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --pose_window 0.5 --reregister 0.35 --matmul_dtype bfloat16 \
  --expname r3_6view_rereg --render_test --i_validate 2000 --i_ckpt 5000

# E2: 3-view narrow arc + re-registration
wait_tunnel || exit 1
run_job 3view_rereg timeout 7200 python run.py --synthetic --steps 20000 \
  --object_iters 2500 --pose_window 0.5 --reregister 0.35 --matmul_dtype bfloat16 \
  --expname r3_3view_rereg --render_test --i_validate 2000 --i_ckpt 5000

# E3: early-phase ablation (separable-conv effect + maskcache/pallas A/B)
wait_tunnel || exit 1
run_job ablate_early timeout 5400 python benchmarks/ablate.py --iters 15 \
  --phase early --variants baseline,no_tv,no_proj,no_object,maskcache,pallas,maskcache+pallas

echo "[queue2] all jobs done $(date +%H:%M:%S)"
