#!/bin/bash
# Round-3 TPU job queue #26 — rerun of the jobs lost to the VM restart
# during queue24/25:
#
#   T1: 3-view winner with grid_type=tensorf — first converged TensoRF run
#       (queue24's last job, killed mid-run).
#   E1: full eval.py on the 60k flagship ckpt with test-time optim, spiral
#       video, and mesh extraction (exercises eval/video/mesh on real TPU).
#   B1/B2: bench.py with superstep 50 / 100 — the mid phase is 70% of a run
#       and each device program dispatch pays fixed axon-relay latency; 25
#       was chosen early, the optimum may be higher.
set -u
cd /root/repo
mkdir -p logs/r3_queue

probe() {
  timeout 100 python -c "import jax, jax.numpy as jnp; print(jax.jit(lambda x: x.sum())(jnp.ones(8)))" > /dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 300); do
    if probe; then echo "[queue26] tunnel up (attempt $i, $(date +%H:%M:%S))"; return 0; fi
    sleep 60
  done
  return 1
}
run_job() {
  local name="$1"; shift
  echo "[queue26] === $name start $(date +%H:%M:%S)"
  "$@" > "logs/r3_queue/${name}.log" 2>&1
  echo "[queue26] === $name done rc=$? $(date +%H:%M:%S)"
}

BASE3="--synthetic --n_views 3 --object_iters 2500 --pose_window 0.5
  --pose_warmup 100 --warmup_gate 8 --warmup_rescue 10
  --loss_weight depth_cons=-2 --dc_start 0.25
  --matmul_dtype bfloat16 --maskcache --render_test --i_validate 2000"

wait_tunnel || exit 1
run_job 3view_tensorf timeout 7200 python run.py $BASE3 --steps 20000 \
  --i_ckpt 10000 --grid_type tensorf --expname r3_3view_tensorf

wait_tunnel || exit 1
run_job 60k_canonical timeout 3600 python eval.py --synthetic --n_views 3 \
  --ckpt logs/r3_3view_60k/last_ckpt.pkl --render_video --eval_mesh \
  --out_dir logs/r3_3view_60k/eval_canonical

wait_tunnel || exit 1
run_job bench_ss50 bash -c "POSEPROBE_SUPERSTEP=50 timeout 3600 python bench.py"

wait_tunnel || exit 1
run_job bench_ss100 bash -c "POSEPROBE_SUPERSTEP=100 timeout 3600 python bench.py"

echo "[queue26] all jobs done $(date +%H:%M:%S)"
