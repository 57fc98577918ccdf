#!/bin/bash
# Round-3 TPU job queue #31 — the sphere-probe protocol.
#
#   S1: 3-view winner recipe with --probe sphere: the synthetic probe is a
#       SPHERE while the object branch still initializes as a cube SDF, so
#       the SIREN deformation field must do real shape adaptation (the
#       paper's "generic objects as pose probes" claim, reference
#       `lib/deformation/deform_net.py`) before PnP anchors on its surface.
#   S2: canonical eval on the S1 checkpoint (dual with/without test optim).
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue31.pid

if [ -f /tmp/queue30.pid ]; then
  q=$(cat /tmp/queue30.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue31] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue31] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue31] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job 3view_sphere timeout 7200 python run.py --synthetic --n_views 3 \
  --probe sphere --steps 20000 --object_iters 2500 --pose_window 0.5 \
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000 \
  --expname r3_3view_sphere

wait_tunnel || exit 1
run_job 3view_sphere_eval timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt logs/r3_3view_sphere/last_ckpt.pkl \
  --out_dir logs/r3_3view_sphere/eval_canonical

echo "[queue31] all jobs done $(date +%H:%M:%S)"
