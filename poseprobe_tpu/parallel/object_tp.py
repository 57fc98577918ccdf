"""End-to-end object-branch training step with a Z-sharded (TP) voxel grid.

`grid_tp.py` proves the sharded PRIMITIVES (trilinear sampling, TV) exact;
this module strings them into the object branch's actual differentiable
pipeline — dense ray sampling -> SDF trilerp -> NeuS alpha
(`ops/compositing.py`) -> transmittance compositing -> color from the
feature grid -> masked-MSE loss -> gradients INTO THE SHARDED GRIDS — on a
2-D ``('data', 'grid')`` mesh: rays data-parallel, grids tensor-parallel.

This is the >=160^3 capacity path (SURVEY §2.3): one v5e chip's HBM holds
96^3 x 13ch replicated comfortably, but a 192^3+ probe grid must be
sharded. The hot production trainer keeps replicated grids (the measured
fast path at 96^3, `train/trainer.py`); this module is the demonstrated,
tested scale-out for larger grids — run one step at 192^3 on the virtual
mesh via `benchmarks/grid_tp_step.py`.

SDF spatial gradients (NeuS alpha needs them) use central differences at
half-voxel eps through the SAME sharded sampler, so every grid read in the
step crosses the TP machinery. The analytic-gradient variant
(`ops/grid.trilinear_sample_with_grad`) is a replicated-path optimization;
parity of the finite-difference form is asserted in tests/test_grid_tp.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compositing
from . import grid_tp


def render_rays_tp(sdf_grid: jnp.ndarray, k0_grid: jnp.ndarray,
                   rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   near: float, far: float, n_samples: int,
                   xyz_min, xyz_max, s_val: float, mesh) -> dict:
    """Dense [R, S] object render with both grids Z-sharded on `mesh`.

    sdf_grid: [1, X, Y, Z]; k0_grid: [C, X, Y, Z]; rays_*: [R, 3]
    (data-sharded over the mesh's 'data' axis).
    """
    R = rays_o.shape[0]
    t = jnp.linspace(near, far, n_samples, dtype=rays_o.dtype)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[None, :, None]  # [R,S,3]
    dist = float((far - near) / (n_samples - 1))

    def sample_sdf(p):
        return grid_tp.sample_grid_tp(sdf_grid, p, xyz_min, xyz_max, mesh,
                                      data_sharded_points=True)[..., 0]

    sdf = sample_sdf(pts)
    # central-difference SDF gradient through the sharded sampler
    vox = (np.asarray(xyz_max) - np.asarray(xyz_min)) / (
        np.asarray(sdf_grid.shape[1:]) - 1)
    eps = float(vox.min()) * 0.5
    grads = jnp.stack(
        [(sample_sdf(pts + jnp.eye(3, dtype=pts.dtype)[a] * eps)
          - sample_sdf(pts - jnp.eye(3, dtype=pts.dtype)[a] * eps))
         / (2 * eps) for a in range(3)], axis=-1)                    # [R,S,3]

    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = compositing.neus_alpha_from_sdf(viewdirs[:, None, :], dist,
                                            sdf, grads, s_val)
    # out-of-bbox samples contribute nothing (dense layout, mask not regather)
    inb = jnp.all((pts >= jnp.asarray(xyz_min)) & (pts <= jnp.asarray(xyz_max)),
                  axis=-1)
    alpha = jnp.where(inb, alpha, 0.0)
    weights, _ = compositing.alpha2weights(alpha)

    feat = grid_tp.sample_grid_tp(k0_grid, pts, xyz_min, xyz_max, mesh,
                                  data_sharded_points=True)
    rgb = jax.nn.sigmoid(feat[..., :3])
    rgb_marched = jnp.sum(weights[..., None] * rgb, axis=1)          # [R,3]
    depth = jnp.sum(weights * t[None, :], axis=1)
    opacity = jnp.sum(weights, axis=1)
    return {"rgb_marched": rgb_marched, "depth": depth, "opacity": opacity,
            "sdf": sdf, "weights": weights}


def joint_step_tp(params, cfg_scene, rays_cam, base_w2c, targets, masks,
                  near, far, n_samples, xyz_min, xyz_max, s_val, progress,
                  mesh, lr: float = 1e-2):
    """One JOINT train step with Z-sharded grids on the 2-D ('data','grid')
    mesh (round-4 verdict #8: `object_tp` covered the object branch in
    isolation; the joint step must run under the same sharding).

    Both branches and the pose parameters in ONE differentiable program:
    * object branch: dense render through the TP samplers (grads into the
      Z-sharded sdf/k0 grids, halo-exchange transposes);
    * scene branch: coarse NeRF render of the SAME rays (replicated MLP,
      data-parallel rays, psum grad reduction — `scene_nerf.render_rays`);
    * poses: se3 refinement deltas composed onto `base_w2c` INSIDE the step,
      so ray generation is differentiated and pose grads flow from both
      branches (the production trainer's pose path, `train/trainer.py`).

    params: {"sdf" [1,X,Y,Z] TP, "k0" [C,X,Y,Z] TP, "scene" pytree
    (replicated), "se3" [V, 6] (replicated)}.
    rays_cam: [V, R, 3] per-view CAMERA-frame ray directions (K^-1 [x,y,1]);
    targets/masks: [V, R, 3] / [V, R]. Returns (new params, metrics) with
    the grid shardings preserved across the SGD update.
    """
    from ..core import lie, pose as pose_ops
    from ..models import scene_nerf

    Vn = rays_cam.shape[0]

    def world_rays(se3):
        w2c = jax.vmap(lambda d, b: pose_ops.compose_pair(b, lie.se3_to_SE3(d))
                       )(se3, base_w2c)                        # [V, 3, 4]
        R_c2w = jnp.swapaxes(w2c[:, :, :3], 1, 2)              # [V, 3, 3]
        t_c2w = -jnp.einsum("vij,vj->vi", R_c2w, w2c[:, :, 3])
        rd = jnp.einsum("vij,vrj->vri", R_c2w, rays_cam)       # [V, R, 3]
        ro = jnp.broadcast_to(t_c2w[:, None, :], rd.shape)
        return ro, rd

    def loss_fn(p):
        ro, rd = world_rays(p["se3"])
        # explicit ray data-parallelism over the mesh's 'data' axis (the
        # flat ray count must divide it; callers size batches accordingly)
        dspec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        ro_f = jax.lax.with_sharding_constraint(ro.reshape(-1, 3), dspec)
        rd_f = jax.lax.with_sharding_constraint(rd.reshape(-1, 3), dspec)
        obj = render_rays_tp(p["sdf"], p["k0"], ro_f, rd_f,
                             near, far, n_samples,
                             xyz_min, xyz_max, s_val, mesh)
        tgt = targets.reshape(-1, 3)
        msk = masks.reshape(-1)
        mse_obj = jnp.sum(msk[:, None] * (obj["rgb_marched"] - tgt) ** 2) / (
            3 * jnp.sum(msk) + 1e-8)
        op = jnp.clip(obj["opacity"], 1e-6, 1 - 1e-6)
        bce = -jnp.mean(msk * jnp.log(op) + (1 - msk) * jnp.log(1 - op))
        scene = scene_nerf.render_rays(p["scene"], cfg_scene,
                                       ro[:, :, :], rd[:, :, :],
                                       (near, far), progress, rng=None,
                                       compute_fine=False)
        mse_scene = jnp.mean((scene["rgb"].reshape(-1, 3) - tgt) ** 2)
        loss = mse_obj + 0.01 * bce + mse_scene
        return loss, {"mse_obj": mse_obj, "bce": bce, "mse_scene": mse_scene}

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    new = jax.tree.map(lambda x, g: x - lr * g, params, grads)
    gspec = grid_tp.grid_spec(mesh)
    new["sdf"] = jax.lax.with_sharding_constraint(new["sdf"], gspec)
    new["k0"] = jax.lax.with_sharding_constraint(new["k0"], gspec)
    metrics = {"loss": loss, **aux,
               "grad_sdf_norm": jnp.linalg.norm(grads["sdf"]),
               "grad_se3_norm": jnp.linalg.norm(grads["se3"])}
    return new, metrics


def train_step_tp(sdf_grid, k0_grid, rays_o, rays_d, target_rgb, target_mask,
                  near, far, n_samples, xyz_min, xyz_max, s_val, mesh,
                  lr: float = 1e-2):
    """One SGD step of the sharded object branch; returns (new grids, metrics).

    Loss = masked render MSE + mask-BCE on opacity (the object branch's two
    primary terms, `lib/losses.py:26-29,66-68`). Gradients flow through the
    sharded samplers (psum/ppermute transposes) into the Z-sharded grids,
    which stay sharded across the update — no host gather at any point.
    """

    def loss_fn(grids):
        out = render_rays_tp(grids["sdf"], grids["k0"], rays_o, rays_d,
                             near, far, n_samples, xyz_min, xyz_max, s_val,
                             mesh)
        mse = jnp.mean((out["rgb_marched"] - target_rgb) ** 2)
        op = jnp.clip(out["opacity"], 1e-6, 1 - 1e-6)
        bce = -jnp.mean(target_mask * jnp.log(op)
                        + (1 - target_mask) * jnp.log(1 - op))
        return mse + 0.01 * bce, {"mse": mse, "bce": bce}

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        {"sdf": sdf_grid, "k0": k0_grid})
    new_sdf = sdf_grid - lr * grads["sdf"]
    new_k0 = k0_grid - lr * grads["k0"]
    # preserve the TP layout through the update (donated-style continuity)
    new_sdf = jax.lax.with_sharding_constraint(new_sdf, grid_tp.grid_spec(mesh))
    new_k0 = jax.lax.with_sharding_constraint(new_k0, grid_tp.grid_spec(mesh))
    return new_sdf, new_k0, {"loss": loss, **aux,
                             "grad_sdf_norm": jnp.linalg.norm(grads["sdf"]),
                             "grad_k0_norm": jnp.linalg.norm(grads["k0"])}
