#!/bin/bash
# Round-3 TPU job queue #10: grid-layout fix measurement + tensorf A/B +
# early-phase re-profile after the trilerp layout commit.
set -u
cd /root/repo
mkdir -p logs/r3_queue

for i in $(seq 1 600); do
  grep -q "all jobs done" logs/r3_queue/queue9.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue10] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue10] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue10] === $name done rc=$? $(date +%H:%M:%S)"
}

# G1: trilerp fwd+bwd in isolation (layout-fix attribution)
wait_tunnel || exit 1
run_job microbench_grid timeout 3600 python benchmarks/microbench_grid.py

# G2: early-phase A/B: dense-grid baseline (with layout fix) vs tensorf k0
wait_tunnel || exit 1
run_job ablate_early_tensorf timeout 7200 python benchmarks/ablate.py --iters 15 \
  --phase early --variants baseline,tensorf,no_smooth

# G3: fresh early-phase trace after the layout fix
wait_tunnel || exit 1
run_job profile_early2 timeout 3600 python benchmarks/profile_step.py --phase early --iters 8

echo "[queue10] all jobs done $(date +%H:%M:%S)"
