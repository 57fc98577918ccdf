#!/bin/bash
# Round-3 TPU job queue #22 — f64 re-eval of the 4/5-view breadth ckpts
# (completes the view-count table under the exact host-float64 metric).
# Serializes behind queue21 (one TPU process at a time).
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue21.pid ]; then
  q=$(cat /tmp/queue21.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue22] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue22] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue22] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 4view_guard_f64 timeout 2400 python eval.py --synthetic --n_views 4 \
  --ckpt logs/r3_4view_guard/last_ckpt.pkl --no_test_optim \
  --out_dir logs/r3_4view_guard/eval_f64

wait_tunnel || exit 1
run_job 5view_guard_f64 timeout 2400 python eval.py --synthetic --n_views 5 \
  --ckpt logs/r3_5view_guard/last_ckpt.pkl --no_test_optim \
  --out_dir logs/r3_5view_guard/eval_f64

echo "[queue22] all jobs done $(date +%H:%M:%S)"
