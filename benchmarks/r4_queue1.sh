#!/bin/bash
# Round-4 TPU job queue #1 — verdict items #2 (real/noisy matches e2e),
# #3 (6-view translation plateau via match-BA polish), #5 (4-view test split).
#
# All runs use the new n_test=4 default (multi-sample PSNR statistics).
# Per-job tunnel gating: a dead tunnel skips THAT job and moves on
# (round-3 ADVICE: exit 1 abandoned the rest of the queue).
set -u
cd /root/repo
mkdir -p logs/r4_queue
echo $$ > /tmp/r4_queue1.pid

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r4q1] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r4q1] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r4_queue/${name}.log" 2>&1
  echo "[r4q1] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {  # gate each TPU job individually; skip on tunnel outage
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r4q1] SKIP $name (tunnel down)"; fi
}

# 6-view w75 guard recipe (round-3 winner: R 0.83 / t 4.06 / PSNR 30.63)
BASE6="--synthetic --n_views 6 --steps 20000 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

# 3-view gate recipe (round-3 flagship, 20k variant: PSNR 32.12 in 22 min)
BASE3="--synthetic --n_views 3 --steps 20000 --object_iters 2500 \
  --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 5000"

# 1. the plateau-breaker: 6-view + match-BA polish (analytic matches)
tpu_job 6view_ba timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --expname r4_6view_ba

# 2. real-matcher e2e, 3-view: SIFT on 128px noise-texture renders
tpu_job 3view_classical timeout 9000 python run.py $BASE3 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --expname r4_3view_classical

# 3. real-matcher e2e, 6-view + BA
tpu_job 6view_classical_ba timeout 9000 python run.py $BASE6 \
  --match_source classical --texture noise --res 128 \
  --pose_ba 0.25,0.45 --expname r4_6view_classical_ba

# 4. hostile noisy-analytic protocol: 1px noise + 15% outliers; BA declines
#    by design, the photometric warmup/rescue stack carries it
tpu_job 3view_noisy timeout 7200 python run.py $BASE3 \
  --match_noise_px 1.0 --match_outliers 0.15 \
  --warmup_gate 1 --expname r4_3view_noisy

# 5. 6-view BA seed-variance check
tpu_job 6view_ba_seed1 timeout 7200 python run.py $BASE6 \
  --pose_ba 0.25,0.45 --seed 1 --expname r4_6view_ba_seed1

# 6. 3-view 60k headline regen on the 4-view test split (verdict #5)
tpu_job 3view_60k timeout 12000 python run.py $BASE3 --steps 60000 \
  --i_ckpt 10000 --render_train --grid_stats --expname r4_3view_60k

echo "[r4q1] all jobs done $(date +%H:%M:%S)"
