#!/bin/bash
# Round-3 TPU job queue #18 (after queue17):
#   W:   microbench_window — decide the (2,2,2) block gather/scatter refactor
#   A:   early ablation at HEAD (fused deform Jacobian + fwd-pin revert in)
#   B:   bench refresh
#   E9/E10: 4-view and 5-view guard runs (view-count breadth of the recipe)
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue17.pid ]; then
  q=$(cat /tmp/queue17.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue18] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue18] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue18] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job window timeout 2400 python benchmarks/microbench_window.py

wait_tunnel || exit 1
run_job ablate_early5 timeout 3000 python benchmarks/ablate.py --iters 15 --phase early \
  --variants baseline,no_object,no_deform,no_proj

wait_tunnel || exit 1
run_job bench8 timeout 3600 python bench.py

wait_tunnel || exit 1
run_job 4view_guard timeout 7200 python run.py --synthetic --n_views 4 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_4view_guard --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job 5view_guard timeout 7200 python run.py --synthetic --n_views 5 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_5view_guard --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue18] all jobs done $(date +%H:%M:%S)"
