#!/bin/bash
# Round-5 TPU queue #0 — short perf probes BEFORE the artifact regeneration
# queue: (a) fused-trunk activation-store sweep (mid-phase lever, verdict
# #3a), (b) fresh early/mid op-level traces at the round-5 HEAD (baseline
# for the early-phase mega-fusion attack, verdict #3b).
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue0.pid

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 60); do
    if probe; then echo "[r5q0] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q0] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q0] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q0] SKIP $name (tunnel down)"; fi
}

tpu_job trunk_ckpt_sweep timeout 1800 python benchmarks/microbench_trunk.py \
  --iters 30
tpu_job trunk_ckpt_sweep_early timeout 1200 python benchmarks/microbench_trunk.py \
  --n 131072 --iters 30
tpu_job profile_early timeout 2400 python benchmarks/profile_step.py \
  --phase early --outdir logs/r5_queue/trace_early
tpu_job profile_mid timeout 2400 python benchmarks/profile_step.py \
  --phase mid --outdir logs/r5_queue/trace_mid

echo "[r5q0] all jobs done $(date +%H:%M:%S)"
