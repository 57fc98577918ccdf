#!/bin/bash
# Round-5 TPU queue #2 — after the artifact regeneration queue (#1):
# retry the early-phase HLO dump (descriptor-binding fix), seed-variance
# 6-view run, the SuperGlue-integration protocol run (random weights,
# verdict #5 — expected to converge poorly/gate-decline, must not crash),
# and a fresh full bench at whatever perf HEAD stands.
set -u
cd /root/repo
mkdir -p logs/r5_queue
echo $$ > /tmp/r5_queue2.pid

if [ -f /tmp/r5_queue1.pid ]; then
  q=$(cat /tmp/r5_queue1.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r5q2] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r5q2] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r5_queue/${name}.log" 2>&1
  echo "[r5q2] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r5q2] SKIP $name (tunnel down)"; fi
}

BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"
BASE3="--synthetic --n_views 3 --steps 20000 --object_iters 2500 \
  --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

tpu_job hlo_early2 timeout 1500 python benchmarks/hlo_dump.py --phase early

# seed variance at the fixed HEAD
tpu_job 6view_ba_seed1 timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --seed 1 --expname r5_6view_ba_seed1

# SuperGlue integration protocol run: random-init weights generated fresh
# (CPU, torch), then the full pipeline with match_source=superglue. The
# matcher is meaningless by construction; PnP fallback + warmup/rescue own
# the weak-match case. Shorter budget: integration proof, not a headline.
run_job gen_sgw timeout 900 python benchmarks/gen_superglue_random_weights.py \
  --out /tmp/sgw_r5
tpu_job 3view_superglue timeout 7200 env POSEPROBE_SUPERGLUE_WEIGHTS=/tmp/sgw_r5 \
  python run.py $BASE3 --match_source superglue --texture noise --res 128 \
  --steps 8000 --expname r5_3view_superglue

# fresh full bench at the standing HEAD (official BENCH_r05 runs at round
# end; this records the number for PERFORMANCE.md + COMMITTED_TPU refresh)
tpu_job bench_r5 timeout 1200 python bench.py

echo "[r5q2] all jobs done $(date +%H:%M:%S)"
