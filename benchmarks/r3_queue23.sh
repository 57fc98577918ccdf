#!/bin/bash
# Round-3 TPU job queue #23 — canonical exact-metric artifacts + the rot-window probe.
#
#   C1/C2: full eval.py (WITH the test-time pose-optim block, like the
#          reference's dual save) on the 3-view headline ckpt and the 6-view
#          guard ckpt — the canonical artifacts under the exact f64 metric.
#   W1:    6-view guard recipe with the rotation window extended 0.5 -> 0.75.
#          Exact per-view errors show R concentrated in the last-activated
#          views (2.7-3.0 deg) and frozen at the window close; previous
#          window conclusions were drawn on the noisy metric. Target:
#          R <= 1.2 with PSNR >= 29.
#   B1:    bench.py at HEAD (sanity after the metric changes; training path
#          untouched, number should match bench7's 42.8k).
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue22.pid ]; then
  q=$(cat /tmp/queue22.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue23] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue23] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue23] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 3view_canonical timeout 3600 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_rescue/last_ckpt.pkl \
  --out_dir logs/r3_3view_rescue/eval_canonical

wait_tunnel || exit 1
run_job 6view_canonical timeout 3600 python eval.py --synthetic --n_views 6 \
  --ckpt logs/r3_6view_guard_f64/last_ckpt.pkl \
  --out_dir logs/r3_6view_guard_f64/eval_canonical

wait_tunnel || exit 1
run_job 6view_guard_w75 timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_guard_w75 --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job bench9 timeout 3600 python bench.py

echo "[queue23] all jobs done $(date +%H:%M:%S)"
