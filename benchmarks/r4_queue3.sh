#!/bin/bash
# Round-4 queue #3 — chord-K re-bound fix verification + realistic-noise
# protocol + perf traces.
#
# 1. diag6_fix: the exact collapse repro (6 views, n_test=4 scene, maskcache)
#    at the FIXED head (update_plastic_chord_k at every pose event). Expect:
#    escape like nomask, frac_neg > 0 at phase end, psnr_obj > 20.
# 2. 6view_ba_fix: full 6-view BA protocol rerun — poses AND an extractable
#    probe (the r4_6view_ba headline had an evaporated probe).
# 3. 3view_noise_real: recalibrated hostile-match protocol at 128 px with
#    0.25 px noise + 15% outliers (~1.2 px @ 300 px equivalent; the 1 px@64
#    variant is beyond the observability floor, journal).
# 4. profile_early/profile_mid: op-level traces at HEAD for the perf push.
set -u
cd /root/repo
mkdir -p logs/r4_queue
echo $$ > /tmp/r4_queue3.pid

if [ -f /tmp/r4_queue2.pid ]; then
  q=$(cat /tmp/r4_queue2.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r4q3] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r4q3] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r4_queue/${name}.log" 2>&1
  echo "[r4q3] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r4q3] SKIP $name (tunnel down)"; fi
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

DIAG6="--synthetic --n_views 6 --steps 2600 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --i_validate 0 --i_ckpt 2500 --grid_stats --maskcache"

tpu_job diag6_fix timeout 2400 python run.py $DIAG6 --expname r4_diag6_fix

tpu_job 6view_ba_fix timeout 9000 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --grid_stats --i_ckpt 10000 --expname r4_6view_ba_fix

tpu_job 3view_noise_real timeout 9000 python run.py $BASE3 \
  --res 128 --match_noise_px 0.25 --match_outliers 0.15 \
  --warmup_gate 1 --warmup_rescue 10 --expname r4_3view_noise_real

tpu_job profile_early timeout 2400 python benchmarks/profile_step.py \
  --phase early --outdir logs/r4_queue/trace_early
tpu_job profile_mid timeout 2400 python benchmarks/profile_step.py \
  --phase mid --outdir logs/r4_queue/trace_mid

echo "[r4q3] all jobs done $(date +%H:%M:%S)"
