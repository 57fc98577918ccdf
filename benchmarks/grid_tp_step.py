"""One end-to-end sharded object-branch step at >=192^3 (grid TP capacity path).

Round-3 verdict #7: exercise grid tensor parallelism beyond primitive parity
— a full differentiable render->loss->grad->update step with the grids
Z-sharded on a 2-D ('data', 'grid') mesh, at a grid size that does NOT fit
replicated on a v5e chip (192^3 x 13ch fp32 ~ 360 MB per copy + optimizer
state + activations).

Usage: python benchmarks/grid_tp_step.py [--grid 192] [--rays 1024]
Runs on the virtual 8-device CPU mesh; no TPU/tunnel involvement.
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=192)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--data_axis", type=int, default=2)
    ap.add_argument("--grid_axis", type=int, default=4)
    ap.add_argument("--out", type=str, default="logs/r4_multichip/grid_tp_step.json")
    args = ap.parse_args()

    from poseprobe_tpu.parallel import grid_tp, object_tp

    mesh = grid_tp.make_grid_mesh(args.data_axis, args.grid_axis)
    G = args.grid
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # cube-SDF-like init: positive outside a centered cube, negative inside
    xs = np.linspace(-0.5, 0.5, G, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    d = np.maximum.reduce([np.abs(X), np.abs(Y), np.abs(Z)]) - 0.3
    sdf = grid_tp.shard_grid(jnp.asarray(d[None]), mesh)
    k0 = grid_tp.shard_grid(
        jax.random.normal(k1, (12, G, G, G), jnp.float32) * 0.05, mesh)

    R = args.rays
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (R, 1))
    ang = jax.random.uniform(k2, (R, 2), minval=-0.25, maxval=0.25)
    rays_d = jnp.stack([jnp.tan(ang[:, 0]), jnp.tan(ang[:, 1]),
                        jnp.ones(R)], axis=-1)
    target_rgb = jax.random.uniform(k3, (R, 3))
    target_mask = (jnp.abs(ang) < 0.15).all(axis=1).astype(jnp.float32)

    step = jax.jit(lambda s, k: object_tp.train_step_tp(
        s, k, rays_o, rays_d, target_rgb, target_mask,
        near=1.0, far=3.5, n_samples=args.samples,
        xyz_min=(-0.5,) * 3, xyz_max=(0.5,) * 3, s_val=0.05, mesh=mesh))

    t0 = time.time()
    new_sdf, new_k0, m = step(sdf, k0)
    jax.block_until_ready(m["loss"])
    compile_and_first = time.time() - t0
    t0 = time.time()
    new_sdf, new_k0, m = step(new_sdf, new_k0)
    jax.block_until_ready(m["loss"])
    second = time.time() - t0

    shard_shape = new_sdf.sharding.shard_shape(new_sdf.shape)
    result = {
        "grid": G, "rays": R, "samples": args.samples,
        "mesh": {"data": args.data_axis, "grid": args.grid_axis},
        "loss": float(m["loss"]), "mse": float(m["mse"]),
        "grad_sdf_norm": float(m["grad_sdf_norm"]),
        "grad_k0_norm": float(m["grad_k0_norm"]),
        "per_device_sdf_shard": list(shard_shape),
        "grid_mem_mb_total": round((new_sdf.size + new_k0.size) * 4 / 2**20, 1),
        "grid_mem_mb_per_device": round(
            (new_sdf.size + new_k0.size) * 4 / 2**20 / args.grid_axis, 1),
        "first_step_s": round(compile_and_first, 1),
        "steady_step_s": round(second, 2),
        "finite": bool(np.isfinite(float(m["loss"]))),
        "platform": str(jax.devices()[0].platform),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    assert result["finite"] and result["grad_sdf_norm"] > 0


if __name__ == "__main__":
    main()
