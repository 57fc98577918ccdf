#!/bin/bash
# Round-3 TPU job queue #25 — 60k canonical artifacts + superstep tuning.
#
#   E1: full eval.py on the 60k flagship ckpt with test-time optim, spiral
#       video, and mesh extraction (exercises eval/video/mesh on real TPU).
#   B1/B2: bench.py with superstep 50 / 100 — the mid phase is 70% of a run
#       and each device program dispatch pays fixed axon-relay latency; 25
#       was chosen early, the optimum may be higher.
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue24.pid ]; then
  q=$(cat /tmp/queue24.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue25] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue25] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue25] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 60k_canonical timeout 3600 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_60k/last_ckpt.pkl --render_video --eval_mesh \
  --out_dir logs/r3_3view_60k/eval_canonical

wait_tunnel || exit 1
run_job bench_ss50 bash -c "POSEPROBE_SUPERSTEP=50 timeout 3600 python bench.py"

wait_tunnel || exit 1
run_job bench_ss100 bash -c "POSEPROBE_SUPERSTEP=100 timeout 3600 python bench.py"

echo "[queue25] all jobs done $(date +%H:%M:%S)"
