#!/bin/bash
# Round-3 TPU job queue #41 — bench at the chord-bound HEAD.
#
# bench_fixed measured 39.4k rays/s (9.62x) with the dense plastic phase;
# the chord-bound K compaction (commit 8081d20) restores the early-phase
# lanes with bit-exact dense parity. Re-measure; expectation: early_ms back
# near 45, weighted >= 10x.
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue41.pid

if [ -f /tmp/queue40.pid ]; then
  q=$(cat /tmp/queue40.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue41] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue41] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue41] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job bench_chord timeout 3600 python bench.py

echo "[queue41] all jobs done $(date +%H:%M:%S)"
