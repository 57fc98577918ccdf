#!/bin/bash
# Round-3 TPU job queue #11: warmup-gate dynamics runs.
# E4b showed warmup injects t 20-48 at activations where PnP was already at
# t 4-5.6 (R healed to 0.31 deg but t plateaued at 9.09). E5 gates the warmup
# on PnP's median reprojection error so good PnP poses are left alone and
# warmup only rescues failures (view-5-style R 16.6 -> 3.8).
set -u
cd /root/repo
mkdir -p logs/r3_queue

for i in $(seq 1 720); do
  grep -q "all jobs done" logs/r3_queue/queue10.log 2>/dev/null && break
  sleep 30
done

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue11] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue11] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue11] === $name done rc=$? $(date +%H:%M:%S)"
}

# E5: E4b (split pose windows) + warmup gate 8px
wait_tunnel || exit 1
run_job 6view_gate timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 \
  --expname r3_6view_gate --render_test --i_validate 2000 --i_ckpt 5000

# E5c: 3-view winner recipe + gate (guard: the 3-view artifact relied on
# ungated warmup; confirm the gate does not regress the headline protocol)
wait_tunnel || exit 1
run_job 3view_gate timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_warmup 100 \
  --warmup_gate 8 --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 \
  --expname r3_3view_gate --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue11] all jobs done $(date +%H:%M:%S)"
