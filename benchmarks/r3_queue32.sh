#!/bin/bash
# Round-3 TPU job queue #32 — fused-trunk kernel variant sweep.
#
# The mid-phase step is 62% Pallas trunk (17.3 of 27.9 ms) at 58 TFLOP/s
# incl. remat vs the 197 TFLOP/s v5e bf16 peak. Two untested levers, both
# both interpret-mode verified vs the baseline kernel:
#   --wt          pre-transposed weights for the bwd dx GEMMs (kills Mosaic's
#                 per-grid-step weight re-transposition); bit-exact
#   --interleave  N independent sub-chains per tile (MXU matmul of one chain
#                 overlaps VPU relu/round of the other); fwd + denc bit-exact,
#                 dW/db differ only by f32 accumulation order (same products,
#                 split-tile partial sums; ~1e-3 rel under cancellation, well
#                 below bf16 training noise)
set -u
cd /root/repo
mkdir -p logs/r3_queue
echo $$ > /tmp/queue32.pid

if [ -f /tmp/queue31.pid ]; then
  q=$(cat /tmp/queue31.pid)
  while kill -0 "$q" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue32] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue32] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue32] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job trunk_base python benchmarks/microbench_trunk.py --iters 30
wait_tunnel || exit 1
run_job trunk_wt python benchmarks/microbench_trunk.py --iters 30 --wt
wait_tunnel || exit 1
run_job trunk_il2 python benchmarks/microbench_trunk.py --iters 30 --interleave 2
wait_tunnel || exit 1
run_job trunk_wt_il2 python benchmarks/microbench_trunk.py --iters 30 --wt --interleave 2
wait_tunnel || exit 1
run_job trunk_wt_il4_t1024 python benchmarks/microbench_trunk.py --iters 30 --wt --interleave 4 --tile 1024
wait_tunnel || exit 1
run_job trunk_il2_t1024 python benchmarks/microbench_trunk.py --iters 30 --interleave 2 --tile 1024

echo "[queue32] all jobs done $(date +%H:%M:%S)"
