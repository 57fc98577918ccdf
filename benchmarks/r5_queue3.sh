#!/bin/bash
# Round-5 TPU queue #3 — final perf block after queue2: the window-scatter +
# fusion-barrier combination (round-3's 800 ms window regression was fusion
# serialization; the barrier isolates the scatter — never tested together),
# plus the skipped mid HLO dump. If the A/B wins, defaults get flipped in
# code and the driver's end-of-round bench picks them up.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue3.pid

if [ -f /tmp/r5_queue2.pid ]; then
  q=$(cat /tmp/r5_queue2.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r5q3] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q3] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q3] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q3] SKIP $name (tunnel down)"; fi
}

tpu_job profile_early_winbar timeout 1800 env POSEPROBE_WINDOW_SCATTER=1 \
  POSEPROBE_SCATTER_BARRIER=1 python benchmarks/profile_step.py \
  --phase early --outdir logs/r5_queue/trace_early_winbar
tpu_job hlo_mid2 timeout 1500 python benchmarks/hlo_dump.py --phase mid

echo "[r5q3] all jobs done $(date +%H:%M:%S)"
