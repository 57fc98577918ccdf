#!/bin/bash
# Round-3 TPU job queue #5: mid-phase decomposition + op-level profile +
# fused-trunk microbench (import-path retry).
set -u
cd /root/repo
mkdir -p logs/r3_queue

for i in $(seq 1 400); do
  grep -q "all jobs done" logs/r3_queue/queue4.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue5] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue5] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue5] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job microbench_trunk timeout 1800 python benchmarks/microbench_trunk.py

wait_tunnel || exit 1
run_job ablate_mid timeout 5400 python benchmarks/ablate.py --iters 15 \
  --phase mid --variants baseline,no_fused,no_corres,no_depth_cons,no_fine

wait_tunnel || exit 1
run_job profile_mid timeout 3600 python benchmarks/profile_step.py --phase mid --iters 8

echo "[queue5] all jobs done $(date +%H:%M:%S)"
