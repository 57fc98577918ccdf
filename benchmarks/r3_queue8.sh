#!/bin/bash
# Round-3 TPU job queue #8: object-branch decomposition + fixed Pallas
# composite A/B (the early ablation showed no_object = -96.8 ms of the
# 107.8 ms early step; maskcache -40.7 ms; the pallas variant crashed on
# a Mosaic cumprod lowering gap, now fixed via log-space triangular matmul).
set -u
cd /root/repo
mkdir -p logs/r3_queue

for i in $(seq 1 600); do
  grep -q "all jobs done" logs/r3_queue/queue7.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue8] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue8] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue8] === $name done rc=$? $(date +%H:%M:%S)"
}

# A3a: fixed Pallas composite + maskcache interactions (early phase)
wait_tunnel || exit 1
run_job ablate_early_pallas timeout 7200 python benchmarks/ablate.py --iters 15 \
  --phase early \
  --variants baseline,pallas,maskcache,maskcache+pallas

# A3b: inside the object branch — deform MLP vs samples vs rays vs grid ops
wait_tunnel || exit 1
run_job ablate_early_obj timeout 7200 python benchmarks/ablate.py --iters 15 \
  --phase early \
  --variants baseline,no_deform,stepsize3,obj_rand512,grid64,no_smooth

# B: refresh the phase-honest bench at current HEAD
wait_tunnel || exit 1
run_job bench4 timeout 3600 python bench.py

echo "[queue8] all jobs done $(date +%H:%M:%S)"
