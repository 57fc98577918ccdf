"""Joint dual-branch trainer: one jitted train step + a thin host loop.

TPU-native rebuild of `scene_rep_reconstruction.optimize_increamental`
(`lib/recon_scene.py:534-777`). The reference's per-step host logic (pose
composition, ray gathering, both renders, all losses, one backward, three
optimizer steps) becomes a single XLA program; the host loop only handles
discrete events:

* incremental view activation + PnP re-initialisation every
  ``camera.incremental_step`` iterations (`recon_scene.py:555-568`),
* phase switches (object-branch cutoff at N_iters, pose-window end, fine
  sampling / depth-consistency start at 30% of max_iter) and the active view
  count — each combination is its own compiled step (a handful of
  compilations, amortized over 60k iterations),
* periodic validation / checkpoints / logging.

Schedules that vary smoothly with step (BARF progress, NeuS s, lr decay,
corres-weight halving, tv_updates) stay *inside* jit as functions of the
traced step — no retracing.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import ExperimentConfig
from ..core import pose as pose_ops, rays as rays_mod
from ..data.base import SceneData
from ..losses import common as loss_common
from ..losses import object as object_losses_mod
from ..losses import projection as projection_losses
from ..losses import scene as scene_losses
from ..models import object_sdf, pose_refine, scene_nerf
from ..ops import grid as grid_ops
from ..parallel import mesh as mesh_mod
from ..pose_init import pnp as pnp_mod
from . import batching, optim as optim_mod
from .state import TrainState


class ProbeHealthError(RuntimeError):
    """The object probe died during its training phase (default-on invariant).

    Raised at the end of the object phase when the raw SDF grid shows a
    catastrophic signature. The probe is the method's thesis — a run that
    loses it must abort, not silently pass on warmup/BA-carried poses
    (round-4 verdict weak #2: `r4_6view_ba` trained 20k steps with frac_neg
    0 from step ~200 and still posted PSNR 33.7).

    Signatures (logs/run_journal, round-3 queue 34-40 + round-4 diag6):
    * evaporation — frac_neg ~ 0: no negative voxels, no interior, PnP
      anchors come from an empty surface;
    * filled box — frac_neg ~ 1: raw grid negative out to the bbox faces,
      mesh extraction empty.
    Known remedies ship in the message (chord-K re-bound is automatic;
    --shell_weight 1.0 --shell_margin 0.05 blocks the filled-box basin).
    Disable only for probe-less/scene-only experiments via
    object_train.probe_health_check=False (run.py --no_probe_check).
    """


class JointTrainer:
    """Owns device-resident data, the compiled step family, and the host loop."""

    def __init__(self, cfg: ExperimentConfig, data: SceneData, seed: int | None = None,
                 mesh=None):
        self.cfg = cfg
        self.data = data
        self.mesh = mesh  # jax.sharding.Mesh for multi-chip ray-DP (None = single chip)
        # progressive scaling (pg_scale): start at num_voxels / 2^len(pg_scale),
        # double the voxel count at each checkpoint step (DVGO semantics for
        # the reference's `pg_scale` knob, configs/dtu_e2e/fine.py:24)
        self._pg_scale = tuple(cfg.object_train.pg_scale)
        self._probe_checked = False  # one-shot end-of-object-phase invariant
        self._final_num_voxels = cfg.object_model.num_voxels
        if self._pg_scale:
            import dataclasses as _dc
            shrunk = int(cfg.object_model.num_voxels / (2 ** len(self._pg_scale)))
            cfg = _dc.replace(cfg, object_model=_dc.replace(
                cfg.object_model, num_voxels=shrunk))
            self.cfg = cfg
        seed = cfg.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_obj, k_scene, k_noise, self._loop_key = jax.random.split(key, 4)

        # --- device data (train views only, ordered by i_train) ---
        it = data.i_train
        self.images = jnp.asarray(data.images[it])
        self.masks = jnp.asarray(data.masks[it])
        self.Ks = jnp.asarray(data.Ks[it])
        self.poses_gt = jnp.asarray(data.poses_gt_w2c[it])
        self.sampler_pixels = jnp.asarray(data.samplers.pixels)
        self.sampler_counts = jnp.asarray(data.samplers.counts)
        self.obj_matches = jnp.asarray(data.obj_matches)
        self.scene_matches = jnp.asarray(data.scene_matches)
        # feature maps for the surface-feature agreement loss (ref eval.py:308)
        self.feature_maps = None
        if cfg.object_train.weight_surface_projection > 0:
            from ..eval.vgg_features import get_multi_features
            self.feature_maps = jnp.asarray(get_multi_features(data.images[it]))
        self.pair_j = jnp.asarray(data.pair_j)
        self.n_train = data.n_train
        self.H, self.W = data.H, data.W

        # dilated-foreground-mask pixel pools for the scene ray sampler
        # (`samples_in_mask`, sampling_strategies.py:57-89)
        sc0 = cfg.scene_train
        self.fg_pixels = self.fg_counts = None
        self._n_fg_patches = 0
        if sc0.sample_fraction_in_fg_mask > 0:
            pools, counts = batching.dilate_fg_mask_pools(
                data.masks[it], sc0.depth_regu_patch_size)
            self.fg_pixels = jnp.asarray(pools)
            self.fg_counts = jnp.asarray(counts)
            n_patches = max(cfg.scene_model.rand_rays // self.n_train
                            // sc0.depth_regu_patch_size**2, 1)
            # cap by the smallest pool like the reference (min_nbr_in_mask)
            self._n_fg_patches = min(int(n_patches * sc0.sample_fraction_in_fg_mask),
                                     int(counts.min()))

        # --- models ---
        obj_params = object_sdf.init_object_params(k_obj, cfg.object_model)
        cam_centers = np.asarray(pose_ops.invert(self.poses_gt))[:, :3, 3]
        obj_params = object_sdf.maskout_near_cam_vox(obj_params, cfg.object_model,
                                                     cam_centers, data.near)
        scene_params = scene_nerf.init_scene_params(k_scene, cfg.scene_model)
        pose_params = pose_refine.init_pose_params(self.n_train)
        self.pose_noise = pose_refine.make_pose_noise(k_noise, self.n_train, cfg.camera.noise)

        # --- pose initialisation: PnP chain (host) or noisy GT ---
        if cfg.pnp.use_pnp or cfg.pnp.use_identical:
            poses_pnp = pnp_mod.initialize_poses_pnp(obj_params, cfg.object_model, data,
                                                     use_identical=cfg.pnp.use_identical)
        else:
            poses_pnp = np.asarray(pose_ops.compose_pair(self.pose_noise, self.poses_gt))

        # --- optimizers ---
        sc = cfg.scene_train
        rot_window = int(sc.max_iter * sc.ratio_end_joint_nerf_pose_refinement)
        trans_window = (None if sc.ratio_end_pose_trans is None
                        else int(sc.max_iter * sc.ratio_end_pose_trans))
        # pose_on stays open until the LAST family's window; per-dim freezing
        # (rotation first, translation later) happens inside the optimizer
        self.pose_window = max(rot_window, trans_window or 0)
        self.opt_obj = optim_mod.build_object_optimizer(cfg.object_train)
        self.opt_scene = optim_mod.build_scene_optimizer(sc)
        self.opt_pose = optim_mod.build_pose_optimizer(cfg.object_train, rot_window,
                                                       trans_window)

        self.state = TrainState(
            obj_params=obj_params,
            scene_params=scene_params,
            pose_params=pose_params,
            opt_obj=self.opt_obj.init(obj_params),
            opt_scene=self.opt_scene.init(scene_params),
            opt_pose=self.opt_pose.init(pose_params),
            poses_pnp=jnp.asarray(poses_pnp),
            step=0,
            n_active=2 if (cfg.camera.incremental and self.n_train > 2) else self.n_train,
        )
        # free-space-skipping occupancy cache (rebuilt periodically in fit()).
        # _k_phase: tight per-ray chord bound for the plastic-phase compaction
        # (content-identical to dense; see refresh_maskcache) — max over GT and
        # PnP-seeded poses so pose drift stays inside the +margin.
        self.mask_arr = None
        self._mask_k = None
        self._k_phase = None
        if cfg.object_model.use_maskcache:
            from ..ops import maskcache as maskcache_mod
            om = cfg.object_model
            all_poses = np.concatenate([np.asarray(self.poses_gt),
                                        np.asarray(poses_pnp)], axis=0)
            all_Ks = np.concatenate([np.asarray(self.Ks)] * 2, axis=0)
            self._k_phase = min(om.n_samples, maskcache_mod.max_inbbox_lanes(
                all_poses, all_Ks, self.H, self.W, om.xyz_min_np, om.xyz_max_np,
                om.stepsize * om.voxel_size))
            self.refresh_maskcache()
        self.fine_start = (int(sc.max_iter * cfg.scene_model.ratio_start_fine_sampling_at_x)
                           if cfg.scene_model.ratio_start_fine_sampling_at_x is not None else 0)
        self.depth_cons_start = (int(sc.max_iter * sc.start_ratio_depth_cons)
                                 if sc.start_ratio_depth_cons is not None else -1)
        self._metrics_hist: list[dict] = []

    # ----------------------------------------------------------- ckpt extras

    def host_extras(self) -> dict:
        """Host-side state for exact resume (train/state.py extras contract):
        the loop RNG key (steps_scan consumes it functionally — without it a
        resumed run draws different ray batches) and the maskcache."""
        ex = {"loop_key": np.asarray(self._loop_key)}
        if self.mask_arr is not None:
            ex["mask_arr"] = np.asarray(self.mask_arr)
        if self._mask_k is not None:
            ex["mask_k"] = np.int64(self._mask_k)
        return ex

    def restore_host_extras(self, extras: dict) -> None:
        """Inverse of `host_extras`; safe on {} (legacy v1 checkpoints keep
        the fresh trainer's key — resumable but not bit-identical)."""
        if "loop_key" in extras:
            self._loop_key = jnp.asarray(extras["loop_key"], jnp.uint32)
        if "mask_arr" in extras:
            self.mask_arr = jnp.asarray(extras["mask_arr"], bool)
        if "mask_k" in extras:
            self._mask_k = int(extras["mask_k"])

    # ------------------------------------------------------------------ poses

    @property
    def _fix_first_pose(self) -> bool:
        # PnP mode anchors the gauge at pose 0; noisy-GT mode refines all
        # (reference get_current_pose vs get_current_pose_pnp); config override
        if self.cfg.camera.fix_first_pose is not None:
            return bool(self.cfg.camera.fix_first_pose)
        return bool(self.cfg.pnp.use_pnp or self.cfg.pnp.use_identical)

    def current_pose(self, state: TrainState | None = None) -> jnp.ndarray:
        state = state or self.state
        return pose_refine.current_pose_pnp(state.pose_params, state.poses_pnp,
                                            fix_first=self._fix_first_pose)

    def current_pose_host(self, state: TrainState | None = None) -> np.ndarray:
        """Host-float64 pose composition for metric/eval/PnP-event paths.

        The device composition runs f32 with bf16-pass matmuls on TPU, baking
        ~1e-3 noise into the pose matrices before any downstream f64
        alignment can help (see core/align.py module docstring).
        """
        from ..core import align as align_mod

        state = state or self.state
        return align_mod.current_pose_pnp_host(
            np.asarray(state.pose_params["se3_refine"]),
            np.asarray(state.poses_pnp), fix_first=self._fix_first_pose)

    # ------------------------------------------------------------------- step

    @functools.partial(jax.jit, static_argnames=("self", "n_active", "object_on", "pose_on",
                                                 "fine_on", "depth_cons_on", "proj_use_deform",
                                                 "precrop_on", "mask_k"),
                       donate_argnames=("state_tuple",))
    def _train_step(self, state_tuple, rng, step, mask_arr, n_active: int,
                    object_on: bool, pose_on: bool, fine_on: bool,
                    depth_cons_on: bool, proj_use_deform: bool,
                    precrop_on: bool = False, mask_k: int | None = None):
        return self._step_impl(state_tuple, rng, step, mask_arr, n_active=n_active,
                               object_on=object_on, pose_on=pose_on, fine_on=fine_on,
                               depth_cons_on=depth_cons_on,
                               proj_use_deform=proj_use_deform, precrop_on=precrop_on,
                               mask_k=mask_k)

    @functools.partial(jax.jit, static_argnames=("self", "k_steps", "n_active", "object_on",
                                                 "pose_on", "fine_on", "depth_cons_on",
                                                 "proj_use_deform", "precrop_on", "mask_k"),
                       donate_argnames=("state_tuple",))
    def _train_scan(self, state_tuple, loop_key, step0, mask_arr, k_steps: int,
                    n_active: int, object_on: bool, pose_on: bool, fine_on: bool,
                    depth_cons_on: bool, proj_use_deform: bool,
                    precrop_on: bool = False, mask_k: int | None = None):
        """K train steps in ONE device program (`lax.scan` superstep).

        Each per-call dispatch through the host (and, in this environment, the
        axon TPU relay) costs fixed latency; scanning K steps inside one XLA
        program amortizes it to 1/K. The key-split sequence matches `fit`'s
        sequential path (`loop_key, rng = split(loop_key)` per step), so the
        result is numerically identical to K `step_once` calls — tested in
        `tests/test_trainer_e2e.py`. Phase flags must be constant over the
        window; `fit` stops windows at every host-event/flag boundary.
        """
        def body(carry, i):
            st, key = carry
            key, sub = jax.random.split(key)
            st, metrics = self._step_impl(
                st, sub, step0 + i, mask_arr, n_active=n_active,
                object_on=object_on, pose_on=pose_on, fine_on=fine_on,
                depth_cons_on=depth_cons_on, proj_use_deform=proj_use_deform,
                precrop_on=precrop_on, mask_k=mask_k)
            return (st, key), metrics

        (state_tuple, loop_key), metrics = jax.lax.scan(
            body, (state_tuple, loop_key), jnp.arange(k_steps, dtype=jnp.int32))
        return state_tuple, loop_key, metrics

    def _step_impl(self, state_tuple, rng, step, mask_arr, n_active: int,
                   object_on: bool, pose_on: bool, fine_on: bool,
                   depth_cons_on: bool, proj_use_deform: bool,
                   precrop_on: bool = False, mask_k: int | None = None):
        (obj_params, scene_params, pose_params,
         opt_obj, opt_scene, opt_pose, poses_pnp) = state_tuple
        cfg = self.cfg
        oc, ot, sc, sm = cfg.object_model, cfg.object_train, cfg.scene_train, cfg.scene_model
        step_f = step.astype(jnp.float32)
        scene_progress = jnp.clip(step_f / sm.max_iter, 0.0, 1.0)
        keys = jax.random.split(rng, 10)
        depth_range = (self.data.near, self.data.far)

        fix_first = self._fix_first_pose

        def loss_fn(trainable):
            obj_p, scene_p, pose_p = trainable
            current_pose = pose_refine.current_pose_pnp(pose_p, poses_pnp,
                                                        fix_first=fix_first)
            if not pose_on:
                # pose window closed (the whole fine phase): the pose update is
                # skipped anyway, so cut the gradient chain at the poses and
                # let XLA dead-code-eliminate the ray-position -> encoding
                # backward (otherwise computed and thrown away every step)
                current_pose = jax.lax.stop_gradient(current_pose)
            metrics: dict[str, Any] = {}
            total = 0.0

            # ---------------- object branch ----------------
            if object_on:
                batch = batching.sample_object_batch(
                    keys[0], ot.N_rand, n_active, self.images, self.masks, self.Ks,
                    current_pose, self.sampler_pixels, self.sampler_counts,
                    self.data.inverse_y)
                # multi-chip: rays sharded over the data mesh, grids replicated
                batch = jax.tree.map(lambda x: mesh_mod.shard_rays(x, self.mesh), batch)
                render_out = object_sdf.render(
                    obj_p, oc, batch.rays_o, batch.rays_d, batch.viewdirs,
                    global_step=step_f, rng=keys[1], use_deform=True, is_train=True,
                    near=self.data.near, far=self.data.far,
                    bg=1.0 if self.data.white_bkgd else 0.0,
                    mask_grid=mask_arr, mask_k=mask_k)
                k0_tv = object_losses_mod.k0_total_variation(obj_p)
                scalars, weights, obj_loss, psnr = object_losses_mod.object_losses(
                    render_out, batch.target, batch.mask, step_f, oc.N_iters,
                    weight_main=ot.weight_main, weight_mask=ot.weight_mask,
                    weight_tv_k0=ot.weight_tv_k0, k0_tv_value=k0_tv, use_deform=True,
                    deform_prior_init=ot.weight_deform_prior_init,
                    deform_prior_final=ot.weight_deform_prior_final)
                obj_loss = obj_loss + self._tv_density_loss(obj_p, step)
                if ot.weight_shell > 0:
                    shell = object_losses_mod.shell_positivity_loss(
                        obj_p["sdf_grid"], ot.shell_margin)
                    obj_loss = obj_loss + ot.weight_shell * shell
                    metrics["shell_loss"] = shell
                metrics["psnr_obj"] = psnr
                metrics["s_val"] = render_out["s_val"]

                if ot.projection_dis_error > 0:
                    r = jax.random.randint(keys[2], (), 0, n_active)
                    pack = self.obj_matches[r]
                    proj_err, near_surf = projection_losses.projection_error_loss(
                        obj_p, oc, current_pose, self.Ks,
                        coord_self=pack[:, 0:2], coord_other=pack[:, 2:4],
                        mconf=pack[:, 4], id_i=self.pair_j[r], id_j=r,
                        global_step=step_f, inverse_y=self.data.inverse_y,
                        use_deform=proj_use_deform, pixel_thre=200.0,
                        near=self.data.near, far=self.data.far,
                        mask_grid=mask_arr, mask_k=mask_k)
                    obj_loss = obj_loss + ot.projection_dis_error * proj_err \
                        + ot.weight_near_surface * near_surf
                    metrics["proj_err"] = proj_err

                if ot.weight_surface_projection > 0 and pose_on and self.feature_maps is not None:
                    # VGG surface-feature agreement (ref recon_scene.py:610-619)
                    r2 = jax.random.randint(keys[8], (), 0, n_active)
                    n_feat_rays = min(256, ot.N_rand)
                    feat_loss = projection_losses.surface_feature_loss(
                        obj_p, oc, current_pose, self.Ks,
                        batch.rays_o[:n_feat_rays], batch.rays_d[:n_feat_rays],
                        id_i=r2, id_j=self.pair_j[r2],
                        feature_maps=self.feature_maps, global_step=step_f,
                        inverse_y=self.data.inverse_y, use_deform=True,
                        near=self.data.near, far=self.data.far)
                    obj_loss = obj_loss + ot.weight_surface_projection * feat_loss
                    metrics["feat_loss"] = feat_loss
                total = total + 0.1 * obj_loss  # joint mix (recon_scene.py:648)

            # ---------------- scene branch (active views only) ----------------
            active_pose = current_pose[:n_active]
            active_K = self.Ks[:n_active]
            # native-bf16 compute params: ONE cast of the (tiny) param tree per
            # step; gradients come back f32 to the optimizer's master weights
            scene_pc = scene_nerf.cast_mlp_params(scene_p, sm.matmul_dtype)
            # center pre-crop during the first precrop_iters steps
            # (`sampling_strategies.py:166-171`, `default_config.py:134-135`)
            sbatch = batching.sample_scene_pixels(
                keys[3], n_active, sm.rand_rays // n_active, self.H, self.W,
                sc.depth_regu_patch_size, self.images[:n_active], n_active,
                precrop=bool(precrop_on), precrop_frac=sc.precrop_frac,
                center_fraction=sc.sampled_fraction_in_center,
                fg_pixels=None if self.fg_pixels is None else self.fg_pixels[:n_active],
                fg_counts=None if self.fg_counts is None else self.fg_counts[:n_active],
                n_fg_patches=self._n_fg_patches)
            center_m, ray_m = rays_mod.get_center_and_ray_at_pixels(
                active_pose, sbatch.pixels, active_K)
            R_v = center_m.shape[1]
            R_main = n_active * R_v

            lw = sc.loss_weight_dict()
            use_corres = lw.get("corres") is not None
            use_dc = depth_cons_on and lw.get("depth_cons") is not None

            # batch ALL grad-carrying ray sets of this step (main photometric +
            # corres pair) into ONE render_rays call: one coarse + one fine MLP
            # launch over the concatenated rays instead of per-loss renders
            # (the reference launches a separate `Graph.render` per loss,
            # `corres_loss.py:178`)
            center_all = center_m.reshape(1, R_main, 3)
            ray_all = ray_m.reshape(1, R_main, 3)
            if use_corres:
                r = jax.random.randint(keys[5], (), 0, n_active)
                pack = self.scene_matches[r]
                px_self, px_other, conf = pack[:, 2:4], pack[:, 0:2], pack[:, 4]
                id_self, id_other = r, self.pair_j[r]
                center_c, ray_c = scene_losses.correspondence_pair_rays(
                    current_pose, self.Ks, px_self, px_other, id_self, id_other)
                M = center_c.shape[1]
                center_all = jnp.concatenate([center_all, center_c.reshape(1, 2 * M, 3)], axis=1)
                ray_all = jnp.concatenate([ray_all, ray_c.reshape(1, 2 * M, 3)], axis=1)
            center_all = mesh_mod.shard_rays(center_all, self.mesh, axis=1)
            ray_all = mesh_mod.shard_rays(ray_all, self.mesh, axis=1)
            rets_all = scene_nerf.render_rays(
                scene_pc, sm, center_all, ray_all, depth_range, progress=scene_progress,
                rng=keys[4], compute_fine=fine_on)

            # split main-ray outputs back to [n_active, R_v, ...] for the losses
            rets = {k: v[:, :R_main].reshape((n_active, R_v) + v.shape[2:])
                    for k, v in rets_all.items() if k not in ("origins", "viewdirs")}
            loss_dict = dict(scene_losses.photometric_and_regu_loss(rets, sbatch.target, sc))

            if use_corres:
                depth_pair = rets_all["depth"][0, R_main:, 0].reshape(2, M)
                depth_fine_pair = (rets_all["depth_fine"][0, R_main:, 0].reshape(2, M)
                                   if "depth_fine" in rets_all else None)
                loss_dict["corres"] = scene_losses.correspondence_loss_from_depths(
                    depth_pair, depth_fine_pair, current_pose, self.Ks,
                    px_self, px_other, conf, id_self, id_other, step_f, sc)
            if use_dc and use_corres:
                # reference reuse path (`compute_loss_from_existing_pixels`,
                # `depth_cons_loss.py:65-120`): the corres self-view pixels and
                # their just-rendered depth ARE the pseudo-GT — no ref render
                d_ref = (depth_fine_pair[0] if depth_fine_pair is not None
                         else depth_pair[0])
                loss_dict["depth_cons"] = scene_losses.depth_consistency_from_ref_depth(
                    scene_pc, sm, active_pose, active_K, px_self, d_ref, id_self,
                    interp_w=jax.random.uniform(keys[7], ()),
                    H=self.H, W=self.W, depth_range=depth_range,
                    progress=scene_progress, iteration=step_f, compute_fine=fine_on,
                    opt=sc, rng=keys[9], ref_valid=conf > 0)
            elif use_dc:
                # no corres term: fresh-pixels path (`compute_loss`,
                # `depth_cons_loss.py:128-340`)
                kp, kx, ky, kw, kr = jax.random.split(keys[7], 5)
                id_dc = jax.random.randint(kp, (), 0, n_active)
                n_ref = max(256, sm.rand_rays)
                pixels_ref = jnp.stack([
                    jax.random.uniform(kx, (n_ref,)) * (self.W - 2),
                    jax.random.uniform(ky, (n_ref,)) * (self.H - 2),
                ], -1)
                loss_dict["depth_cons"] = scene_losses.depth_consistency_loss(
                    scene_pc, sm, active_pose, active_K, pixels_ref, id_dc,
                    interp_w=jax.random.uniform(kw, ()),
                    H=self.H, W=self.W, depth_range=depth_range,
                    progress=scene_progress, iteration=step_f, compute_fine=fine_on,
                    use_fine_depth_as_ref=fine_on, opt=sc, rng=kr)
            scene_loss = loss_common.summarize_losses(loss_dict, lw)
            total = total + scene_loss
            mse = ((rets["rgb"] - sbatch.target) ** 2).mean()
            metrics["psnr_scene"] = loss_common.mse2psnr(mse)
            metrics["loss_render"] = loss_dict["render"]
            if "corres" in loss_dict:
                metrics["loss_corres"] = loss_dict["corres"]
            metrics["loss_total"] = total
            return total, metrics

        trainable = (obj_params, scene_params, pose_params)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        g_obj, g_scene, g_pose = grads

        if object_on:
            up_obj, opt_obj = self.opt_obj.update(g_obj, opt_obj, obj_params)
            obj_params = jax.tree.map(lambda p, u: p + u, obj_params, up_obj)
        up_scene, opt_scene = self.opt_scene.update(g_scene, opt_scene, scene_params)
        scene_params = jax.tree.map(lambda p, u: p + u, scene_params, up_scene)
        if pose_on:
            up_pose, opt_pose = self.opt_pose.update(g_pose, opt_pose, pose_params)
            pose_params = jax.tree.map(lambda p, u: p + u, pose_params, up_pose)

        new_state = (obj_params, scene_params, pose_params, opt_obj, opt_scene,
                     opt_pose, poses_pnp)
        return new_state, metrics

    def _tv_density_loss(self, obj_p, step):
        """weight_tv_density * (sdf TV + smoothed-grad TV) with the tv_updates
        step schedule applied as traced weights (`scan1.py:66-80`)."""
        ot, oc = self.cfg.object_train, self.cfg.object_model
        if ot.weight_tv_density <= 0:
            return 0.0
        sdf_tv = jnp.asarray(ot.sdf_tv)
        smooth_tv = jnp.asarray(ot.smooth_grad_tv)
        for ev_step, updates in ot.tv_updates:
            upd = dict(updates)
            if "sdf_tv" in upd:
                sdf_tv = jnp.where(step >= ev_step, upd["sdf_tv"], sdf_tv)
            if "smooth_grad_tv" in upd:
                smooth_tv = jnp.where(step >= ev_step, upd["smooth_grad_tv"], smooth_tv)
        total = 0.0
        if ot.sdf_tv > 0:
            total = total + grid_ops.total_variation(obj_p["sdf_grid"]) / 2.0 / oc.voxel_size * sdf_tv
        if ot.smooth_grad_tv > 0:
            grad = grid_ops.sdf_gradient_grid(obj_p["sdf_grid"], jnp.asarray(oc.voxel_size))
            kernel = object_losses_mod._tv_smooth_kernel()
            total = total + grid_ops.smooth_grad_tv(grad, kernel) * smooth_tv
        return ot.weight_tv_density * total

    # ------------------------------------------------------------------- loop

    def phase_flags(self, step: int) -> dict:
        cfg = self.cfg
        return dict(
            n_active=self.state.n_active,
            object_on=cfg.object_train.N_iters > 0 and step <= cfg.object_train.N_iters,
            pose_on=step < self.pose_window and cfg.object_train.lr_pose > 0,
            fine_on=bool(cfg.scene_model.fine_sampling and step >= self.fine_start),
            depth_cons_on=bool(self.depth_cons_start >= 0 and step >= self.depth_cons_start),
            proj_use_deform=(step <= cfg.object_train.N_iters) and self.state.n_active > 2,
            precrop_on=step < cfg.scene_train.precrop_iters,
        )

    def scale_volume_grid(self, num_voxels: int) -> None:
        """Progressive grid scaling (pg_scale): trilinear-resize the SDF and
        feature grids to the new resolution and rebuild the object optimizer.

        Mirrors `scale_volume_grid` (`voxurf_coarse.py:393-405`) + the
        optimizer re-creation the reference performs after scaling. A host
        event — the next step compiles for the new static shapes.
        """
        import dataclasses

        from ..ops import grid as grid_ops

        old_cfg = self.cfg.object_model
        new_cfg = dataclasses.replace(old_cfg, num_voxels=num_voxels)
        new_size = new_cfg.world_size
        obj = dict(self.state.obj_params)
        obj["sdf_grid"] = grid_ops.resize_trilinear(obj["sdf_grid"], new_size)
        if isinstance(obj["k0_grid"], dict):
            from ..ops import tensorf
            obj["k0_grid"] = tensorf.tensorf_resize(obj["k0_grid"], new_size)
        else:
            obj["k0_grid"] = grid_ops.resize_trilinear(obj["k0_grid"], new_size)
        self.cfg = dataclasses.replace(self.cfg, object_model=new_cfg)
        self.state.obj_params = obj
        self.state.opt_obj = self.opt_obj.init(obj)

    def refresh_maskcache(self) -> None:
        """(Re)build the free-space occupancy mask.

        During the PLASTIC object phase (step <= N_iters), geometry-dependent
        occupancy is NEVER used: the raw-threshold mask ratchets shut and
        drains non-cube probes (queue35 bisect: the sphere run's final mask
        was literally empty — every sample dropped, no gradient could ever
        recover it), and even an all-True mask with the default K=0.5 lane
        truncation collapses the CUBE probe (queue36 cube_fixed_sanity: it
        cuts the far half of in-bbox chords, which the cube's silhouette —
        unlike the sphere's front-half-only visible surface — needs for its
        back-face edges). The reference never skips during plastic training
        either: its MaskCache is frozen from a CONVERGED coarse stage
        (`lib/voxurf_coarse.py:1271-1292`).

        Instead, the plastic phase uses an all-True mask with K = the tight
        per-ray chord bound over all training views (+drift margin,
        ``maskcache.max_inbbox_lanes``): every in-bbox sample of every ray
        survives compaction — CONTENT-IDENTICAL to the dense path
        (parity-tested) — while the lanes the worst-case bbox-diagonal
        budget wastes are cut (38% on the synthetic protocol).

        At the phase boundary, occupancy is rebuilt from the MAPPED grid
        thresholded at the current NeuS sharpness (``build_mask_grid_mapped``,
        self-stabilizing under the drifting alpha/beta mapping) and the
        configured K takes over for the geometry-frozen scene-phase renders.
        The mask_k flip is a static jit arg, so each K gets its own program
        (the phase-flag flip at N_iters recompiles anyway)."""
        from ..ops import compositing, maskcache

        om = self.cfg.object_model
        if self.state.step <= self.cfg.object_train.N_iters:
            self.mask_arr = jnp.ones(self.state.obj_params["sdf_grid"].shape[1:], bool)
            self._mask_k = self._k_phase
            if self.state.step > 0:
                # joint refinement drifts poses between refreshes too
                self.update_plastic_chord_k()
            return
        s_val = float(compositing.s_val_schedule(
            min(self.state.step, om.N_iters), om.s_ratio, om.s_start, om.step_start))
        mapped = object_sdf.processed_sdf_grid(self.state.obj_params, om)
        self.mask_arr = maskcache.build_mask_grid_mapped(
            mapped, s_val, sigma=om.maskcache_sigma, dilate=om.maskcache_dilate,
            prev=self.mask_arr)
        self._mask_k = None  # config budget (maskcache_keep) post-phase

    def maybe_pg_scale(self, step: int) -> None:
        """Progressive-scaling host event: double the voxel count at each
        pg_scale checkpoint (`configs/dtu_e2e/fine.py:24`; DVGO loop semantics)."""
        if step not in self._pg_scale:
            return
        n_rest = len(self._pg_scale) - self._pg_scale.index(step) - 1
        self.scale_volume_grid(int(self._final_num_voxels / (2 ** n_rest)))
        if self.cfg.object_model.use_maskcache:
            self.refresh_maskcache()

    def reregister_poses(self) -> None:
        """Re-run the PnP chain for all views against scene-NeRF depth.

        Mid-training re-registration (classical incremental-SfM practice; an
        extension over the reference): activation-time PnP against the
        deformable probe SDF injects per-view translation error (probe-scale
        ambiguity — measured in logs/run_journal). Once the scene NeRF's
        depth is sharp, one chained re-PnP against it snaps every pose back
        into the common gauge; the refinement params restart from zero and
        the pose optimizer keeps polishing.
        """
        cfg = self.cfg
        cur = self.current_pose_host()
        progress = min(self.state.step / cfg.scene_model.max_iter, 1.0)
        use_fine = bool(cfg.scene_model.fine_sampling and self.state.step >= self.fine_start)
        poses_pnp = np.asarray(self.state.poses_pnp).copy()
        poses_pnp[0] = cur[0]
        # each view solved INDEPENDENTLY against the fixed current scene
        # (anchors = depth under the neighbour's current pose) — a chained
        # solve would re-accumulate drift along the chain
        for i in range(1, self.state.n_active):
            prev = i - 1
            solved = pnp_mod.pnp_from_scene_depth(
                self.state.scene_params, cfg.scene_model,
                np.asarray(self.scene_matches[i]), np.asarray(self.Ks[i]),
                cur[prev], depth_range=(self.data.near, self.data.far),
                progress=progress, use_fine=use_fine)
            # pnp_from_scene_depth falls back to the *neighbour's* pose on
            # failure; in that case keep view i's own current pose instead
            poses_pnp[i] = cur[i] if np.allclose(solved, cur[prev]) else solved
        self.state.poses_pnp = jnp.asarray(poses_pnp)
        refine = np.asarray(self.state.pose_params["se3_refine"]).copy()
        refine[: self.state.n_active] = 0.0
        self.state.pose_params = dict(self.state.pose_params,
                                      se3_refine=jnp.asarray(refine))

    def _ba_steps(self) -> tuple:
        return tuple(int(r * self.cfg.scene_model.max_iter)
                     for r in self.cfg.camera.ba_at_ratios)

    def update_plastic_chord_k(self) -> None:
        """Re-bound the plastic-phase chord K for the CURRENT poses.

        The init-time bound (GT + PnP seeds + 6-lane margin) is NOT
        invariant under training: an activation warmup can accept a pose
        with a large transient translation excursion (observed t x100 up to
        58, queue1 6-view logs), moving a camera close enough that its
        in-bbox chords exceed K — far samples then silently truncate, the
        probe's far side starves, and the mask-BCE/render losses carve the
        SDF empty (r4 6-view collapse: frac_neg -> 0 by the phase end;
        bisect: n_test=4 scene + maskcache collapses, maskcache-off
        recovers, r4_diag6_* TPU runs). Called from every host pose event;
        K only GROWS (monotone: one recompile per bump, no thrash) and is
        ceiling-ed by the dense budget."""
        om = self.cfg.object_model
        if not om.use_maskcache or self._k_phase is None:
            return
        if self.state.step > self.cfg.object_train.N_iters:
            return
        from ..ops import maskcache as maskcache_mod

        poses = np.concatenate([np.asarray(self.poses_gt),
                                self.current_pose_host()], axis=0)
        Ks = np.concatenate([np.asarray(self.Ks)] * 2, axis=0)
        k = min(om.n_samples, maskcache_mod.max_inbbox_lanes(
            poses, Ks, self.H, self.W, om.xyz_min_np, om.xyz_max_np,
            om.stepsize * om.voxel_size))
        if k > self._k_phase:
            print(f"[maskcache {self.state.step}] plastic chord K "
                  f"{self._k_phase} -> {k} (pose drift re-bound)")
            self._k_phase = k
            if self._mask_k is not None:
                self._mask_k = k

    def check_probe_health(self) -> dict:
        """End-of-object-phase probe invariant (see ProbeHealthError).

        Fires once when the host loop crosses object_train.N_iters; returns
        the measured raw-grid stats and raises ProbeHealthError on the
        evaporation / filled-box signatures unless
        cfg.object_train.probe_health_check is off."""
        raw = np.asarray(self.state.obj_params["sdf_grid"])
        n_neg = int((raw < 0).sum())
        frac_neg = float(n_neg) / raw.size
        beta = float(object_sdf.softplus10(self.state.obj_params["sdf_beta"]))
        stats = {"frac_neg": frac_neg, "n_neg": n_neg, "map_beta": beta,
                 "raw_min": float(raw.min()), "raw_max": float(raw.max())}
        evaporated = n_neg < 8 or frac_neg < 1e-4
        filled = frac_neg > 0.98
        stats["healthy"] = not (evaporated or filled)
        if stats["healthy"] or not self.cfg.object_train.probe_health_check:
            if not stats["healthy"]:
                print(f"[trainer] WARNING probe health check disabled but "
                      f"probe is unhealthy: {stats}")
            return stats
        kind = ("EVAPORATED (no negative SDF voxels -> no interior, PnP "
                "anchors come from nothing)" if evaporated else
                "FILLED BOX (negative out to the bbox faces -> mesh "
                "extraction empty)")
        raise ProbeHealthError(
            f"object probe {kind} at the end of the object phase "
            f"(step {self.state.step}): {stats}. A run without a live probe "
            "must not count as a pass. Diagnose with run.py --grid_stats; "
            "for the filled-box basin try --shell_weight 1.0 "
            "--shell_margin 0.05; healthy dynamics collapse map_beta to "
            "~0.01-0.5 within ~300 steps (map_beta > ~2 with frac_neg "
            "draining is the collapse signature). Disable only for "
            "probe-less experiments via --no_probe_check.")

    def _ba_observations(self, n_act: int):
        """Match packs -> BA observations for the active views (chain
        scene+object pairs plus (i-2, i) skip pairs)."""
        from ..pose_init import ba as ba_mod

        packs, pairs = [], []
        for i in range(1, self.n_train):
            j = int(np.asarray(self.pair_j)[i])
            packs.append(np.asarray(self.scene_matches[i]))
            pairs.append((j, i))
            packs.append(np.asarray(self.obj_matches[i]))
            pairs.append((j, i))
        if self.data.ba_matches is not None and len(self.data.ba_matches):
            for pack, ab in zip(self.data.ba_matches, self.data.ba_pairs):
                packs.append(np.asarray(pack))
                pairs.append((int(ab[0]), int(ab[1])))
        return ba_mod.observations_from_packs(packs, pairs, n_act)

    def polish_poses_ba(self) -> dict:
        """Match-based bundle-adjustment pose polish (host event).

        See `pose_init/ba.py`: triangulate the load-time match packs (chain
        scene+object pairs plus (i-2, i) skip pairs for scale chaining) from
        the current poses, LM-refine every non-anchor active view, write the
        polished poses into `poses_pnp`, and restart the refinement rows from
        zero (exactly the `reregister_poses` handoff). Unlike scene-depth
        re-registration, the matches cannot co-adapt to wrong poses, so this
        attacks the activation-injected translation plateau directly.
        """
        from ..pose_init import ba as ba_mod

        n_act = self.state.n_active
        obs = self._ba_observations(n_act)
        cur = self.current_pose_host()
        polished, info = ba_mod.polish_poses_matches(
            cur[:n_act], np.asarray(self.Ks)[:n_act],
            obs, fix_first=self._fix_first_pose)
        if not info["applied"]:
            print(f"[ba {self.state.step}] polish skipped: {info}")
            return info
        poses_pnp = np.asarray(self.state.poses_pnp).copy()
        poses_pnp[:n_act] = polished
        self.state.poses_pnp = jnp.asarray(poses_pnp)
        refine = np.asarray(self.state.pose_params["se3_refine"]).copy()
        refine[:n_act] = 0.0
        self.state.pose_params = dict(self.state.pose_params,
                                      se3_refine=jnp.asarray(refine))
        moved = float(np.abs(polished - cur[:n_act]).max())
        print(f"[ba {self.state.step}] polished {n_act} poses from "
              f"{len(obs)} pair packs: med reproj "
              f"{info['med_reproj_px']:.2f} px, {info['rounds']} rounds, "
              f"max pose delta {moved:.4f}")
        return info

    def maybe_activate_view(self, step: int) -> None:
        """Incremental activation + PnP of the newly added view (host event)."""
        cfg = self.cfg
        if not cfg.camera.incremental or self.state.n_active >= self.n_train:
            return
        if step == 0 or step % cfg.camera.incremental_step != 0:
            return
        new_idx = self.state.n_active  # next train view
        cur = self.current_pose_host()
        pnp_mod.LAST_QUALITY = None  # refreshed by solve_pnp below
        if cfg.pnp.use_identical:
            new_pose = cur[new_idx - 1]
        elif cfg.pnp.use_pnp and cfg.pnp.anchor == "scene":
            # scene-gauge anchors: depth rendered by the scene branch at the
            # previous view's match pixels (avoids the probe-scale ambiguity
            # that the round-2 runs showed injecting t-error per activation)
            new_pose = pnp_mod.pnp_from_scene_depth(
                self.state.scene_params, cfg.scene_model,
                np.asarray(self.scene_matches[new_idx]), np.asarray(self.Ks[new_idx]),
                cur[new_idx - 1], depth_range=(self.data.near, self.data.far),
                progress=min(step / cfg.scene_model.max_iter, 1.0),
                use_fine=bool(cfg.scene_model.fine_sampling and step >= self.fine_start))
        elif cfg.pnp.use_pnp and cfg.pnp.anchor == "object_scaled":
            # probe anchors with one median scene/probe depth-ratio rescale
            new_pose = pnp_mod.pnp_from_matches_scalefixed(
                self.state.obj_params, cfg.object_model,
                np.asarray(self.obj_matches[new_idx]), np.asarray(self.Ks[new_idx]),
                cur[new_idx - 1], inverse_y=self.data.inverse_y,
                near=self.data.near, far=self.data.far,
                scene_params=self.state.scene_params, scene_cfg=cfg.scene_model,
                progress=min(step / cfg.scene_model.max_iter, 1.0),
                use_fine=bool(cfg.scene_model.fine_sampling and step >= self.fine_start))
        elif cfg.pnp.use_pnp:
            new_pose = pnp_mod.pnp_from_matches(
                self.state.obj_params, cfg.object_model,
                np.asarray(self.obj_matches[new_idx]), np.asarray(self.Ks[new_idx]),
                cur[new_idx - 1], inverse_y=self.data.inverse_y,
                near=self.data.near, far=self.data.far,
                extra_packs=[np.asarray(self.scene_matches[new_idx])])
        else:
            # no-PnP protocols seed from poses_pnp = noise∘GT (reference
            # `get_current_pose`, `recon_scene.py:51-59`)
            new_pose = np.asarray(self.state.poses_pnp[new_idx])
        q = pnp_mod.LAST_QUALITY
        if q is not None:
            qtag = (f"pnp med_reproj {q['med_reproj_px']:.1f}px n {q['n_pts']}"
                    f"{' FALLBACK' if q.get('fallback') else ''}")
        elif cfg.pnp.use_identical:
            qtag = "seed (prev view)"
        elif cfg.pnp.use_pnp:
            qtag = "pnp (no-ransac)"
        else:
            qtag = "seed (gt+noise)" if self.cfg.camera.noise else "seed (gt)"
        pnp_pose0 = np.asarray(new_pose).copy()  # pre-warmup/rescue: the
        # anchor-scale-true start for the activation match refinement below
        self._log_activation_error(step, new_idx, cur, new_pose, qtag)
        # warmup gate: a PnP pose that already reprojects tightly is better
        # than anything a blurry early-BARF render can align (see config)
        from ..eval import evaluator

        gate = cfg.camera.activation_warmup_gate_px
        photo_ratio = cfg.camera.activation_warmup_photo_ratio
        holdout_gate = cfg.camera.activation_warmup_holdout_px
        progress = min(step / cfg.scene_model.max_iter, 1.0)
        use_fine = bool(cfg.scene_model.fine_sampling and step >= self.fine_start)

        def photo_score(pose, idx):
            return evaluator.photometric_pose_score(
                self.state.scene_params, cfg.scene_model, pose, self.Ks[idx],
                self.images[idx], (self.data.near, self.data.far),
                progress=progress, use_fine=use_fine)

        do_warmup = cfg.camera.activation_pose_warmup > 0
        if do_warmup and gate > 0 and q is not None and not q.get("fallback", False) \
                and q["med_reproj_px"] <= gate:
            skip_msg = (f"PnP med reproj {q['med_reproj_px']:.1f}px <= gate {gate:g}px")
            do_warmup = False
            hold = q.get("holdout_reproj_px", 0.0)
            if holdout_gate > 0 and hold > holdout_gate:
                # geometric second opinion: the solve fits its own anchors
                # but does not generalize across a holdout split -> degenerate
                do_warmup = True
                print(f"[activate {step}] view {new_idx}: holdout gate re-arms "
                      f"warmup (xval reproj {hold:.1f}px > {holdout_gate:g}px)")
            elif holdout_gate > 0:
                skip_msg += f", holdout {hold:.1f}px <= {holdout_gate:g}px"
            if not do_warmup and photo_ratio > 0:
                # photometric second opinion: a degenerate PnP solve (shallow
                # match spread) reprojects tightly but renders wrong — compare
                # the new view's fixed-ray MSE against the previous, already-
                # trained view as the scale for "consistent with the scene"
                s_new = photo_score(new_pose, new_idx)
                s_ref = photo_score(cur[new_idx - 1], new_idx - 1)
                if s_new > photo_ratio * max(s_ref, 1e-8):
                    do_warmup = True
                    print(f"[activate {step}] view {new_idx}: photo gate re-arms "
                          f"warmup (mse {s_new:.4f} > {photo_ratio:g}x ref {s_ref:.4f})")
                else:
                    skip_msg += f", photo mse {s_new:.4f} <= {photo_ratio:g}x ref {s_ref:.4f}"
            if not do_warmup:
                print(f"[activate {step}] view {new_idx}: warmup skipped ({skip_msg})")
        if do_warmup:
            # photometric warmup: align the new view against the current
            # scene before the joint loss sees it (cuts the PnP t-injection)
            warm_pose = np.asarray(evaluator.test_time_pose_optim(
                self.state.scene_params, cfg.scene_model,
                jnp.asarray(new_pose), self.Ks[new_idx],
                self.images[new_idx], (self.data.near, self.data.far),
                n_iters=cfg.camera.activation_pose_warmup,
                lr=cfg.camera.activation_warmup_lr,
                rand_rays=min(1024, self.H * self.W),
                progress=progress, use_fine=use_fine,
                rot_only=cfg.camera.activation_warmup_rot_only,
                center_anchor=cfg.camera.activation_warmup_center_anchor))
            if photo_ratio > 0 or holdout_gate > 0:
                # guarded: only accept the warmup if it scores better on the
                # same fixed rays (the early-BARF render can be too blurry to
                # align against, degrading good PnP poses — see config)
                s_pnp = photo_score(new_pose, new_idx)
                s_warm = photo_score(warm_pose, new_idx)
                accept = s_warm <= s_pnp
                why = f"mse pnp {s_pnp:.4f} -> warm {s_warm:.4f}"
                mg = cfg.camera.activation_warmup_match_guard
                if accept and mg > 0 and q is not None and "world_pts" in q:
                    # match-anchor guard (round-5): the photometric score CAN
                    # prefer a corrupted pose — a new view's mse improves
                    # under the poorly-generalizing scene while the pose
                    # diverges (observed t 3.5 -> 24 x100 at every
                    # activation, evaporating the probe). The activation's
                    # own PnP anchors are the co-adaptation-free referee.
                    med_warm = pnp_mod.reproj_for_pose(q, warm_pose)
                    lim = max(mg * max(q["med_reproj_px"], 0.5),
                              cfg.camera.match_guard_px_floor)
                    if med_warm > lim:
                        accept = False
                        why += (f"; match guard REJECTS: warm reproj "
                                f"{med_warm:.1f}px > {lim:.1f}px "
                                f"(pnp {q['med_reproj_px']:.1f}px)")
                    else:
                        why += f", warm reproj {med_warm:.1f}px <= {lim:.1f}px"
                if accept:
                    new_pose = warm_pose
                print(f"[activate {step}] view {new_idx}: warmup "
                      f"{'accepted' if accept else 'REJECTED'} ({why})")
            else:
                new_pose = warm_pose
            self._log_activation_error(step, new_idx, cur, new_pose, "warmup")
        rescue_ratio = cfg.camera.activation_rescue_ratio
        if rescue_ratio > 0:
            # catastrophic-PnP rescue: a degenerate RANSAC solve can land far
            # outside the warmup's basin (observed: med_reproj 0.3px yet
            # R 35deg off) — if the settled pose still renders much worse
            # than the previous trained view, restart from that view's pose
            s_final = photo_score(new_pose, new_idx)
            s_ref = photo_score(cur[new_idx - 1], new_idx - 1)
            if s_final > rescue_ratio * max(s_ref, 1e-8):
                prev_pose = np.asarray(cur[new_idx - 1])
                cands = [(s_final, new_pose, "kept"),
                         (photo_score(prev_pose, new_idx), prev_pose, "prev")]
                if cfg.camera.activation_pose_warmup > 0:
                    # full-SE3 warmup: consecutive views differ in both R and
                    # t, so the rot-only constraint does not apply here
                    warm_prev = np.asarray(evaluator.test_time_pose_optim(
                        self.state.scene_params, cfg.scene_model,
                        jnp.asarray(prev_pose), self.Ks[new_idx],
                        self.images[new_idx], (self.data.near, self.data.far),
                        n_iters=cfg.camera.activation_pose_warmup,
                        lr=cfg.camera.activation_warmup_lr,
                        rand_rays=min(1024, self.H * self.W),
                        progress=progress, use_fine=use_fine,
                        center_anchor=cfg.camera.activation_warmup_center_anchor))
                    cands.append((photo_score(warm_prev, new_idx), warm_prev,
                                  "warm-prev"))
                s_best, new_pose, tag = min(cands, key=lambda c: c[0])
                print(f"[activate {step}] view {new_idx}: rescue tournament "
                      f"(mse {s_final:.4f} > {rescue_ratio:g}x ref {s_ref:.4f})"
                      f" -> {tag} (mse {s_best:.4f})")
                if tag != "kept":
                    self._log_activation_error(step, new_idx, cur, new_pose,
                                               f"rescue:{tag}")
        mr_gate = cfg.camera.activation_match_refine_px
        if mr_gate > 0 and cfg.pnp.use_pnp and not cfg.pnp.use_identical:
            # scoped to the PnP-activation regime: no-PnP protocols seed
            # from noise-composed GT (reference behavior) and must not be
            # silently snapped to match geometry
            # match-geometry refinement of the settled pose (round-5): LM
            # over the NEW view's 6-dof pose on its own match packs against
            # the trusted views (pose_init/ba.refine_view_matches). The
            # pairwise geometry cannot co-adapt, and the one-view problem is
            # benign enough for multi-start LM to recover even 12-deg-off
            # degenerate PnP solves (measured: R 12 / t x100 16 -> R 0.10 /
            # t 0.88 on real SIFT packs). Accepted only when the converged
            # median residual is below the gate — garbage matches decline.
            from ..pose_init import ba as ba_mod

            poses_now = np.asarray(cur).copy()
            poses_now[new_idx] = new_pose
            obs_act = self._ba_observations(new_idx + 1)
            # RESCUE-ONLY trigger: a settled pose already consistent with
            # the packs is left alone. At weak conditioning (64 px, two
            # partners, near-planar matches) several poses fit the packs
            # equally well, so "refining" a consistent pose can hop into a
            # wrong-but-consistent basin (observed R 1.66 / t 5.3 ->
            # R 2.5 / t 48 at med 0.02 px); refinement is for poses that
            # are measurably INCONSISTENT (the corrupted-warmup /
            # degenerate-PnP cases, residuals in the tens of px).
            med_settled = ba_mod.view_match_med_px(poses_now,
                                                   np.asarray(self.Ks),
                                                   obs_act, new_idx)
            if med_settled <= mr_gate:
                print(f"[activate {step}] view {new_idx}: match refine "
                      f"skipped (settled pose consistent, med "
                      f"{med_settled:.2f}px <= {mr_gate:g}px)")
                obs_act = []  # fall through without refining
            # start order matters (strict-improvement tie-break in ba.py):
            # the raw PnP pose first — its anchors pin the translation scale
            # along the narrow-baseline near-null direction where several
            # basins converge to ~equal match cost (observed: a rescue-
            # corrupted start refined to med 0.02 px at t x100 17 while the
            # PnP-start basin sits at the true translation)
            refined, mr = ba_mod.refine_view_matches(
                poses_now, np.asarray(self.Ks), obs_act, new_idx,
                starts=[("pnp", pnp_pose0),
                        ("settled", new_pose),
                        ("prev", np.asarray(cur[new_idx - 1]))])
            if mr["applied"] and mr["med_px"] <= mr_gate:
                moved = float(np.abs(refined - new_pose).max())
                new_pose = refined
                print(f"[activate {step}] view {new_idx}: match refine "
                      f"accepted (start {mr['start']}, med "
                      f"{mr['med_px']:.2f}px <= {mr_gate:g}px, "
                      f"max delta {moved:.4f})")
                self._log_activation_error(step, new_idx, cur, new_pose,
                                           "match-refine")
            elif mr["applied"]:
                print(f"[activate {step}] view {new_idx}: match refine "
                      f"declined (med {mr['med_px']:.2f}px > {mr_gate:g}px)")
        poses_pnp = np.asarray(self.state.poses_pnp).copy()
        poses_pnp[new_idx] = new_pose
        self.state.poses_pnp = jnp.asarray(poses_pnp)
        self.state.n_active += 1
        # the settled pose may sit far from the init-time camera set; keep
        # the plastic-phase chord K sound for it (see update_plastic_chord_k)
        self.update_plastic_chord_k()

    def _log_activation_error(self, step, new_idx, cur, new_pose, tag) -> None:
        """Print the activated view's RELATIVE pose error vs GT (gauge-free).

        Instrumentation for the activation-injection hunt: compares the solved
        (new ∘ prev^-1) against GT's, isolating this activation's error from
        global gauge drift. Host-only, no effect on training."""
        try:
            from ..core import lie, pose as pose_ops

            def rel(a, b):  # a ∘ b^{-1}
                Ra, ta = a[:, :3], a[:, 3]
                Rb, tb = b[:, :3], b[:, 3]
                R = Ra @ Rb.T
                return R, ta - R @ tb

            gt = np.asarray(self.poses_gt)
            R_s, t_s = rel(np.asarray(new_pose), cur[new_idx - 1])
            R_g, t_g = rel(gt[new_idx], gt[new_idx - 1])
            dR = np.degrees(float(np.asarray(lie.rotation_distance(
                jnp.asarray(R_s)[None], jnp.asarray(R_g)[None]))[0]))
            dt = float(np.linalg.norm(t_s - t_g)) * 100.0
            print(f"[activate {step}] view {new_idx} ({tag}): "
                  f"rel-pose error R {dR:.2f}deg t {dt:.2f}")
        except Exception:
            pass

    def step_once(self, rng) -> dict:
        state = self.state
        flags = self.phase_flags(state.step)
        state_tuple = (state.obj_params, state.scene_params, state.pose_params,
                       state.opt_obj, state.opt_scene, state.opt_pose, state.poses_pnp)
        new_tuple, metrics = self._train_step(
            state_tuple, rng, jnp.asarray(state.step, jnp.int32), self.mask_arr,
            mask_k=self._mask_k, **flags)
        # state_tuple buffers are DONATED: rebind every leaf (incl. the
        # pass-through poses_pnp) from the returned tuple
        (state.obj_params, state.scene_params, state.pose_params,
         state.opt_obj, state.opt_scene, state.opt_pose, state.poses_pnp) = new_tuple
        state.step += 1
        return metrics

    def steps_scan(self, k: int) -> dict:
        """Run `k` steps in one device program; returns stacked [k] metrics.

        The caller must guarantee no host event or phase-flag flip falls
        inside [step, step+k) — `fit` does; direct callers (bench) should stay
        away from boundaries. Consumes the loop key exactly like `fit`'s
        sequential path (one split per step)."""
        state = self.state
        flags = self.phase_flags(state.step)
        assert self._next_boundary(state.step) >= state.step + k, \
            f"scan window [{state.step},{state.step + k}) crosses a host event"
        state_tuple = (state.obj_params, state.scene_params, state.pose_params,
                       state.opt_obj, state.opt_scene, state.opt_pose, state.poses_pnp)
        new_tuple, self._loop_key, metrics = self._train_scan(
            state_tuple, self._loop_key, jnp.asarray(state.step, jnp.int32),
            self.mask_arr, k, mask_k=self._mask_k, **flags)
        # donated input: rebind all leaves from the return (see step_once)
        (state.obj_params, state.scene_params, state.pose_params,
         state.opt_obj, state.opt_scene, state.opt_pose, state.poses_pnp) = new_tuple
        state.step += k
        return metrics

    def _next_boundary(self, step: int) -> int:
        """First step > `step` at which a host event fires or a phase flag
        flips — a `lax.scan` window starting at `step` must end by then."""
        cfg, ot = self.cfg, self.cfg.object_train
        cands = []
        if cfg.camera.incremental and self.state.n_active < self.n_train:
            inc = cfg.camera.incremental_step
            cands.append(((step // inc) + 1) * inc)     # maybe_activate_view
        cands += [s for s in self._pg_scale if s > step]  # maybe_pg_scale
        if cfg.camera.reregister_at_ratio is not None:
            cands.append(int(cfg.camera.reregister_at_ratio * cfg.scene_model.max_iter))
        cands += [s for s in self._ba_steps() if s > step]  # polish_poses_ba
        if cfg.object_model.use_maskcache and step <= ot.N_iters + ot.maskcache_update_every:
            upd = ot.maskcache_update_every
            cands.append(((step // upd) + 1) * upd)     # refresh_maskcache
        # phase-flag flips (phase_flags thresholds)
        cands += [ot.N_iters + 1, self.pose_window, self.fine_start,
                  self.depth_cons_start, cfg.scene_train.precrop_iters]
        return min([c for c in cands if c > step], default=step + 1_000_000_000)

    def fit(self, num_steps: int, log_every: int = 0, callback=None,
            superstep: int = 1) -> list[dict]:
        """Host loop. With ``superstep=K>1``, steps between host events run as
        K-step `lax.scan` programs (numerically identical to K single steps;
        windows never cross an event/flag/log boundary)."""
        ot = self.cfg.object_train
        rereg_at = (int(self.cfg.camera.reregister_at_ratio * self.cfg.scene_model.max_iter)
                    if self.cfg.camera.reregister_at_ratio is not None else -1)
        end_step = self.state.step + num_steps
        while self.state.step < end_step:
            step = self.state.step
            if not self._probe_checked and 0 < ot.N_iters <= step:
                self._probe_checked = True  # one-shot, pre-raise: a caller
                # catching the error can resume without re-raising each step
                self.check_probe_health()
            self.maybe_activate_view(step)
            self.maybe_pg_scale(step)
            if step == rereg_at and step > 0:
                self.reregister_poses()
            if step > 0 and step in self._ba_steps():
                self.polish_poses_ba()
            if (self.cfg.object_model.use_maskcache and step > 0
                    and step <= ot.N_iters + ot.maskcache_update_every
                    and step % ot.maskcache_update_every == 0):
                self.refresh_maskcache()
            limit = min(end_step, self._next_boundary(step))
            if log_every:  # windows end exactly on log boundaries
                limit = min(limit, ((step // log_every) + 1) * log_every)
            if superstep > 1 and limit - step >= superstep:
                metrics = self.steps_scan(superstep)
                metrics = jax.tree.map(lambda x: x[-1], metrics)
            else:
                self._loop_key, rng = jax.random.split(self._loop_key)
                metrics = self.step_once(rng)
            if log_every and self.state.step % log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                # in-loop NaN/Inf tripwire (reference `base_losses.py:96-97`)
                if not np.isfinite(host.get("loss_total", 0.0)):
                    raise FloatingPointError(
                        f"non-finite loss at step {self.state.step}: {host}")
                host["step"] = self.state.step
                host["n_active"] = self.state.n_active
                self._metrics_hist.append(host)
                if callback is not None:
                    callback(host)
        return self._metrics_hist

    # ------------------------------------------------------------------- eval

    def validate(self, n_views: int = 5) -> float:
        """Validation PSNR over (up to) `n_views` test views rendered in the
        optimized frame.

        Mirrors the periodic validation of `optimize_increamental`
        (`recon_scene.py:688-722`) / `Graph.val_step` over the val split
        (`renderer.py:937-1026`): align the current train poses to GT,
        backtrack the test poses through the inverse sim3, render, and return
        mean PSNR. Multi-view by default so best-ckpt selection is not noise
        from a single view. Updates `state.best_val`.
        """
        import numpy as np

        from ..core import align as align_mod
        from ..eval import evaluator, metrics as metrics_mod

        data = self.data
        if len(data.i_test) == 0:
            return float("nan")
        cur = self.current_pose_host()
        _, sim3 = evaluator.align_train_poses(cur, self.poses_gt)
        psnrs = []
        for t in range(min(n_views, len(data.i_test))):
            i = data.i_test[t]
            pose_t = align_mod.backtrack_from_aligning_the_trajectory(
                jnp.asarray(data.poses_gt_w2c[i][None]), sim3)[0]
            # before fine sampling starts training, the fine MLP is untrained —
            # score the coarse output (else val PSNR is a frozen constant).
            # progress must match training: BARF-masked PE bands have
            # untrained weights until the c2f window closes.
            fine_trained = bool(self.cfg.scene_model.fine_sampling
                                and self.state.step >= self.fine_start)
            progress = min(self.state.step / self.cfg.scene_model.max_iter, 1.0)
            out = evaluator.render_full(self.state.scene_params, self.cfg.scene_model,
                                        pose_t, jnp.asarray(data.Ks[i]),
                                        self.H, self.W, (data.near, data.far),
                                        use_fine=fine_trained, progress=progress)
            psnrs.append(float(metrics_mod.psnr(out["rgb"], jnp.asarray(data.images[i]))))
        val = float(np.mean(psnrs))
        if val > self.state.best_val:
            self.state.best_val = val
        return val

    def render_full_image(self, pose_w2c: jnp.ndarray, K: jnp.ndarray,
                          chunk: int = 2048, fine: bool = True) -> dict:
        """Chunked scene-branch full-image render (`render_by_slices`, `renderer.py:629-663`)."""
        sm = self.cfg.scene_model
        use_fine = bool(fine and sm.fine_sampling)
        center, ray = rays_mod.get_center_and_ray(pose_w2c[None], self.H, self.W, K[None])
        outs: dict[str, list] = {"rgb": [], "depth": [], "opacity": [], "depth_var": []}
        suffix = "_fine" if use_fine else ""
        progress = min(self.state.step / sm.max_iter, 1.0)
        for c in range(0, self.H * self.W, chunk):
            sl = slice(c, min(c + chunk, self.H * self.W))
            # full-image eval rides the same ray-DP mesh as training: each
            # chunk's rays sharded over ('data',), params replicated (no-op
            # single-chip)
            rets = scene_nerf.render_rays(
                self.state.scene_params, sm,
                mesh_mod.shard_rays(center[:, sl], self.mesh, axis=1),
                mesh_mod.shard_rays(ray[:, sl], self.mesh, axis=1),
                (self.data.near, self.data.far), progress=progress, rng=None,
                compute_fine=use_fine, mode_train=False)
            for k in outs:
                outs[k].append(rets[k + suffix])
        return {k: jnp.concatenate(v, axis=1).reshape(self.H, self.W, -1)
                for k, v in outs.items()}
