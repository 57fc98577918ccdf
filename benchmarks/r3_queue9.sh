#!/bin/bash
# Round-3 TPU job queue #9: re-measure mid-phase after the gather-free
# sampling + split-trunk-output commit (0dfa2a2), A/B the PRNG impl, and
# re-run E4a (6-view winner-recipe control) that was lost to an edit race.
set -u
cd /root/repo
mkdir -p logs/r3_queue

for i in $(seq 1 600); do
  grep -q "all jobs done" logs/r3_queue/queue8.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue9] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue9] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue9] === $name done rc=$? $(date +%H:%M:%S)"
}

# M1: mid-phase after the hot-op cuts + rbg PRNG A/B
wait_tunnel || exit 1
run_job ablate_mid2 timeout 7200 python benchmarks/ablate.py --iters 20 \
  --phase mid --variants baseline,rbg,no_fused,no_fine

# M2: fresh mid-phase trace for the next hot-op table
wait_tunnel || exit 1
run_job profile_mid2 timeout 3600 python benchmarks/profile_step.py --phase mid --iters 8

# E4a rerun: the EXACT 3-view winner recipe at 6 views (control for E4b)
wait_tunnel || exit 1
run_job 6view_winner_recipe timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_warmup 100 \
  --loss_weight depth_cons=-2 --dc_start 0.25 --matmul_dtype bfloat16 \
  --expname r3_6view_winner_recipe --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue9] all jobs done $(date +%H:%M:%S)"
