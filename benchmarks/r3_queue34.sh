#!/bin/bash
# Round-3 TPU job queue #34 — sphere-probe object-collapse diagnosis.
#
# Queue31's sphere run drained the raw SDF to all-positive (min 0.29, no
# zero crossing -> empty mesh) while poses/NVS stayed healthy. These jobs
# replay the object phase at PRODUCTION scale with per-chunk raw-grid stats
# (benchmarks/debug_probe_collapse.py) to find when the inside region drains
# and which pressure does it: base timeline, cube control, slow s-schedule
# (s_ratio 500), deform priors ~off (1e-3 init).
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue34.pid

if [ -f /tmp/queue33.pid ]; then
  q=$(cat /tmp/queue33.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue34] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue34] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue34] === $name done rc=$? $(date +%H:%M:%S)"
}

DBG="python benchmarks/debug_probe_collapse.py --tpu --full_scale --chunk 100 --object_iters 2500"

wait_tunnel || exit 1
run_job dbg_sphere timeout 2400 $DBG --probe sphere --steps 2600

wait_tunnel || exit 1
run_job dbg_cube timeout 2400 $DBG --probe cube --steps 800

wait_tunnel || exit 1
run_job dbg_sphere_sratio500 timeout 2400 $DBG --probe sphere --steps 2600 --s_ratio 500

wait_tunnel || exit 1
run_job dbg_sphere_noprior timeout 2400 $DBG --probe sphere --steps 2600 --deform_prior_init 0.001

echo "[queue34] all jobs done $(date +%H:%M:%S)"
