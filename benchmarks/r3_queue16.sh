#!/bin/bash
# Round-3 TPU job queue #16: measure the layout-pin + trunk-tile work, then
# refresh the step ablations and the driver bench at HEAD, then validate the
# holdout warmup gate in a 6-view dynamics run.
#   G0/G1: microbench_grid with POSEPROBE_PIN_LAYOUT=0/1 (the 22.2 ms k0
#          scatter fix — expect the 12/13-ch VJP pairs to collapse)
#   T:     microbench_trunk tile sweep 256/512/1024
#   A1/A2: early+mid ablations at HEAD (maskcache now interacts with the pin)
#   B:     bench refresh (superstep=25, maskcache, pinned layouts)
#   E7:    6-view gated warmup with the PnP-holdout second opinion
set -u
cd /root/repo
mkdir -p logs/r3_queue

if [ -f /tmp/queue15.pid ]; then
  q=$(cat /tmp/queue15.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue16] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue16] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue16] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job grid_pin0 bash -c "POSEPROBE_PIN_LAYOUT=0 timeout 2400 python benchmarks/microbench_grid.py"
wait_tunnel || exit 1
run_job grid_pin1 bash -c "POSEPROBE_PIN_LAYOUT=1 timeout 2400 python benchmarks/microbench_grid.py"

wait_tunnel || exit 1
run_job trunk_t256 timeout 1800 python benchmarks/microbench_trunk.py --tile 256
wait_tunnel || exit 1
run_job trunk_t512 timeout 1800 python benchmarks/microbench_trunk.py --tile 512
wait_tunnel || exit 1
run_job trunk_t1024 timeout 1800 python benchmarks/microbench_trunk.py --tile 1024

wait_tunnel || exit 1
run_job ablate_early3 timeout 4000 python benchmarks/ablate.py --iters 15 --phase early \
  --variants baseline,no_object,maskcache,no_deform,no_smooth
wait_tunnel || exit 1
run_job ablate_mid3 timeout 3000 python benchmarks/ablate.py --iters 15 --phase mid \
  --variants baseline,no_fine,no_depth_cons,no_corres,no_fused

wait_tunnel || exit 1
run_job bench6 timeout 3600 python bench.py

# E7: holdout-gated warmup (the photo gate rescued bad PnP but also touched
# good poses; the holdout gate should only fire on degenerate solves)
wait_tunnel || exit 1
run_job 6view_holdout timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --warmup_holdout 2 \
  --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_6view_holdout --render_test --i_validate 2000 --i_ckpt 5000

echo "[queue16] all jobs done $(date +%H:%M:%S)"
