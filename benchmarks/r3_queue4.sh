#!/bin/bash
# Round-3 TPU job queue #4: fused-trunk microbench + retries of the jobs that
# raced the kernel fix (E2 6-view warmup, early-phase ablation) + fresh bench.
set -u
cd /root/repo
mkdir -p logs/r3_queue

# wait for queue3 to release the TPU
for i in $(seq 1 200); do
  grep -q "all jobs done" logs/r3_queue/queue3.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue4] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue4] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue4] === $name done rc=$? $(date +%H:%M:%S)"
}

# M1: isolated fused-trunk timing + on-TPU parity assert
wait_tunnel || exit 1
run_job microbench_trunk timeout 1800 python benchmarks/microbench_trunk.py

# B3: fresh headline bench with the fused trunk engaged
wait_tunnel || exit 1
run_job bench3 timeout 3600 python bench.py

# E2r: 6-view, co-scheduled window + activation pose warmup (retry)
wait_tunnel || exit 1
run_job 6view_warmup timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --pose_window 0.5 --fine_start 0.5 --pose_warmup 100 \
  --matmul_dtype bfloat16 --expname r3_6view_warmup --render_test \
  --i_validate 2000 --i_ckpt 5000

# A1r: early-phase ablation in the object-active regime (retry)
wait_tunnel || exit 1
run_job ablate_early timeout 5400 python benchmarks/ablate.py --iters 15 \
  --phase early --variants baseline,no_tv,no_proj,no_object,maskcache,pallas,maskcache+pallas

echo "[queue4] all jobs done $(date +%H:%M:%S)"
