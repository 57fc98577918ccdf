#!/bin/bash
# Round-3 TPU job queue #29 — regenerate the 60k flagship ckpt (lost to the
# VM restart; ckpt pkls are gitignored) and run the canonical eval on it:
# dual with/without test-optim numbers + spiral video + mesh extraction.
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue28.pid ]; then
  q=$(cat /tmp/queue28.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue29] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue29] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue29] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE3="--synthetic --n_views 3 --object_iters 2500 --pose_window 0.5
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10
  --loss_weight depth_cons=-2 --dc_start 0.25
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

wait_tunnel || exit 1
run_job 3view_60k_b timeout 10000 python run.py $BASE3 --steps 60000 \
  --i_ckpt 10000 --render_train --expname r3_3view_60k_b

wait_tunnel || exit 1
run_job 60k_canonical_b timeout 5400 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_60k_b/last_ckpt.pkl --render_video --eval_mesh \
  --out_dir logs/r3_3view_60k_b/eval_canonical

echo "[queue29] all jobs done $(date +%H:%M:%S)"
