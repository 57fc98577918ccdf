#!/bin/bash
# Round-3 TPU job queue #14: reordered remainder of queue13 (launched after
# ablate_mid2 finished and queue13's bash was stopped). Perf measurements
# first — they validate the new lax.scan superstep path on TPU and quantify
# the per-dispatch relay overhead hours before the long dynamics runs:
#   B:   bench refresh at HEAD (superstep=25 + maskcache, the new defaults)
#   B1:  bench with POSEPROBE_SUPERSTEP=1 (dispatch-overhead A/B)
#   R:   relay_overhead microbench (per-call latency floor)
#   E5:  6-view gated-warmup dynamics run (targets R<=1.2 t<=5 PSNR>=29)
#   E5c: 3-view winner recipe + gate + maskcache (headline-protocol guard)
#   P:   op-level traces of the mid and early steps
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue14] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue14] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue14] === $name done rc=$? $(date +%H:%M:%S)"
}

wait_tunnel || exit 1
run_job bench5 timeout 3600 python bench.py

wait_tunnel || exit 1
run_job bench5_nostack bash -c "POSEPROBE_SUPERSTEP=1 timeout 3600 python bench.py"

wait_tunnel || exit 1
run_job relay_overhead timeout 1200 python benchmarks/relay_overhead.py

# E5: split windows + gated warmup (queue11's lost run)
wait_tunnel || exit 1
run_job 6view_gate timeout 7200 python run.py --synthetic --n_views 6 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_trans_window 1.0 \
  --pose_warmup 100 --warmup_gate 8 --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 \
  --expname r3_6view_gate --render_test --i_validate 2000 --i_ckpt 5000

# E5c: 3-view winner recipe + gate + maskcache (guard for the headline
# protocol AND the first converged run with free-space skipping on)
wait_tunnel || exit 1
run_job 3view_gate_mc timeout 7200 python run.py --synthetic --n_views 3 \
  --steps 20000 --object_iters 2500 --pose_window 0.5 --pose_warmup 100 \
  --warmup_gate 8 --loss_weight depth_cons=-2 --dc_start 0.25 \
  --matmul_dtype bfloat16 --maskcache \
  --expname r3_3view_gate_mc --render_test --i_validate 2000 --i_ckpt 5000

wait_tunnel || exit 1
run_job profile_mid2 bash -c "timeout 3600 python benchmarks/profile_step.py --phase mid --iters 8 --outdir logs/profile_mid && python benchmarks/trace_top.py logs/profile_mid --steps 8 --top 30"

wait_tunnel || exit 1
run_job profile_early2 bash -c "timeout 3600 python benchmarks/profile_step.py --phase early --iters 8 --outdir logs/profile_early && python benchmarks/trace_top.py logs/profile_early --steps 8 --top 30"

echo "[queue14] all jobs done $(date +%H:%M:%S)"
