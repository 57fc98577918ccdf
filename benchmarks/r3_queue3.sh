#!/bin/bash
# Round-3 TPU job queue #3: activation pose-warmup experiments + bench + ablation.
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue3] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}

run_job() {
  local name="$1"; shift
  echo "[queue3] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue3] === $name done rc=$? $(date +%H:%M:%S)"
}

# B1: fresh bench (separable smoothing convs landed since the last number)
wait_tunnel || exit 1
run_job bench2 timeout 3600 python bench.py

# E2: 6-view, co-scheduled window (run7) + activation photometric pose warmup
wait_tunnel || exit 1
run_job 6view_warmup timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --pose_window 0.5 --fine_start 0.5 --pose_warmup 100 \
  --matmul_dtype bfloat16 --expname r3_6view_warmup --render_test \
  --i_validate 2000 --i_ckpt 5000

# A1: early-phase ablation in the object-active regime (maskcache/pallas A/B)
wait_tunnel || exit 1
run_job ablate_early timeout 5400 python benchmarks/ablate.py --iters 15 \
  --phase early --variants baseline,no_tv,no_proj,no_object,maskcache,pallas,maskcache+pallas

# E3: 3-view, run5 schedule + warmup + stronger/earlier depth consistency
wait_tunnel || exit 1
run_job 3view_warmup_dc timeout 7200 python run.py --synthetic \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_warmup 100 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --matmul_dtype bfloat16 \
  --expname r3_3view_warmup_dc --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue3] all jobs done $(date +%H:%M:%S)"
