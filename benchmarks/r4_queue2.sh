#!/bin/bash
# Round-4 queue #2 — 6-view object-phase collapse bisect.
#
# r4_6view_ba's probe SDF drained all-positive (empty box) by step ~200
# (psnr_obj 13.8@100 -> 4.2@200, flat thereafter; saved raw grid
# [1.11, 3.83], map_beta 3.33 — the collapse signature on the OTHER sign).
# 3-view runs at the same HEAD are healthy (psnr_obj 20-36). No round-3
# 6-view run executed at the final chord-bound HEAD, so this may be latent
# since queue34-40. Short (2.6k-step) object-phase diagnostics:
#   a) current HEAD, exact BASE6 recipe + grid_stats  (reproduce w/ stats)
#   b) + --n_test 2          (scene-instance/rng hypothesis)
#   c) - --maskcache         (chord-bound compaction hypothesis)
#   d) --seed 1              (draw variance)
#   e) round-3 HEAD (0c3397a) in a worktree, same recipe (code bisect)
set -u
cd /root/repo
mkdir -p logs/r4_queue
echo $$ > /tmp/r4_queue2.pid

# wait for queue1 to finish (one TPU process at a time)
if [ -f /tmp/r4_queue1.pid ]; then
  q=$(cat /tmp/r4_queue1.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then echo "[r4q2] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[r4q2] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r4_queue/${name}.log" 2>&1
  echo "[r4q2] === $name done rc=$? $(date +%H:%M:%S)"
}
tpu_job() {
  local name="$1"
  if wait_tunnel; then run_job "$@"; else echo "[r4q2] SKIP $name (tunnel down)"; fi
}

DIAG6="--synthetic --n_views 6 --steps 2600 --object_iters 2500 \
  --pose_window 0.75 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --i_validate 0 --i_ckpt 2500 --grid_stats"

tpu_job diag6_repro timeout 2400 python run.py $DIAG6 --maskcache \
  --expname r4_diag6_repro
tpu_job diag6_ntest2 timeout 2400 python run.py $DIAG6 --maskcache --n_test 2 \
  --expname r4_diag6_ntest2
tpu_job diag6_nomask timeout 2400 python run.py $DIAG6 \
  --expname r4_diag6_nomask
tpu_job diag6_seed1 timeout 2400 python run.py $DIAG6 --maskcache --seed 1 \
  --expname r4_diag6_seed1

# round-3 HEAD control in a worktree (old code, old defaults: n_test=2)
if [ ! -d /tmp/r3head ]; then
  git worktree add /tmp/r3head 0c3397a 2>/dev/null || true
fi
if [ -d /tmp/r3head ]; then
  if wait_tunnel; then
    echo "[r4q2] === diag6_r3head start $(date +%H:%M:%S)"
    (cd /tmp/r3head && timeout 2400 python run.py --synthetic --n_views 6 \
      --steps 2600 --object_iters 2500 --pose_window 0.75 --pose_trans_window 1.0 \
      --pose_warmup 100 --warmup_gate 8 --warmup_photo_ratio 4 \
      --loss_weight depth_cons=-2 --dc_start 0.25 \
      --matmul_dtype bfloat16 --i_validate 0 --i_ckpt 2500 --grid_stats \
      --maskcache --expname r4_diag6_r3head) \
      > logs/r4_queue/diag6_r3head.log 2>&1
    echo "[r4q2] === diag6_r3head done rc=$? $(date +%H:%M:%S)"
    cp -r /tmp/r3head/logs/r4_diag6_r3head logs/ 2>/dev/null || true
  fi
fi

echo "[r4q2] all jobs done $(date +%H:%M:%S)"
