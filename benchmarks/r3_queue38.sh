#!/bin/bash
# Round-3 TPU job queue #38 — fixed-sphere canonical eval + geometry scoring.
#
#   E1: canonical NVS/pose eval of the queue36 fixed sphere run (dual
#       with/without test-time optim), replacing queue31's collapsed-object
#       artifact as the non-cube-probe protocol result.
#   E2: hermetic mesh-GT chamfer of the fixed sphere ckpt (eval.py
#       --mesh_only vs analytic sphere surface) — the geometry half of the
#       "generic objects as pose probes" claim (CPU job, no TPU needed, but
#       serialized here to keep one process).
#   E3: probe_shape_eval on the same ckpt (deformed-SDF radial stats +
#       --no_deform ablation).
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue38.pid

if [ -f /tmp/queue37.pid ]; then
  q=$(cat /tmp/queue37.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue38] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue38] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue38] === $name done rc=$? $(date +%H:%M:%S)"
}

CKPT=logs/r3_3view_sphere_fixed/last_ckpt.pkl

wait_tunnel || exit 1
run_job sphere_fixed_eval timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt "$CKPT" \
  --out_dir logs/r3_3view_sphere_fixed/eval_canonical

run_job sphere_fixed_meshgt timeout 3600 python eval.py --synthetic --n_views 3 \
  --probe sphere --ckpt "$CKPT" --mesh_only --cpu \
  --out_dir logs/r3_3view_sphere_fixed/eval_mesh_gt

run_job sphere_fixed_shape timeout 1800 python benchmarks/probe_shape_eval.py \
  --ckpt "$CKPT" --probe sphere --cpu

echo "[queue38] all jobs done $(date +%H:%M:%S)"
