#!/bin/bash
# Round-5 TPU queue #0b — perf iteration block between the probe queue (#0)
# and the long artifact queue (#1): HLO dumps for fusion attribution,
# early-phase scatter-barrier A/B, trunk variant combos on top of ckpt1.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue0b.pid

if [ -f /tmp/r5_queue0.pid ]; then
  q=$(cat /tmp/r5_queue0.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 30; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 60); do
    if probe; then echo "[r5q0b] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q0b] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q0b] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q0b] SKIP $name (tunnel down)"; fi
}

tpu_job hlo_early timeout 1500 python benchmarks/hlo_dump.py --phase early
tpu_job profile_early_barrier timeout 1800 env POSEPROBE_SCATTER_BARRIER=1 \
  python benchmarks/profile_step.py --phase early \
  --outdir logs/r5_queue/trace_early_barrier
tpu_job trunk_ckpt1_wt timeout 1200 python benchmarks/microbench_trunk.py \
  --ckpt 1 --wt --iters 30
tpu_job trunk_ckpt1_il2 timeout 1200 python benchmarks/microbench_trunk.py \
  --ckpt 1 --interleave 2 --iters 30
tpu_job hlo_mid timeout 1500 python benchmarks/hlo_dump.py --phase mid

echo "[r5q0b] all jobs done $(date +%H:%M:%S)"

# appended while running (bash reads lazily): retry the early HLO dump with
# the descriptor-binding fix so fusion attribution lands BEFORE queue1
tpu_job hlo_early_fix timeout 1500 python benchmarks/hlo_dump.py --phase early
echo "[r5q0b] appended jobs done $(date +%H:%M:%S)"
