"""Unified experiment configuration.

One dataclass tree replaces the reference's two config systems:
* mmengine python configs with `_base_` inheritance for the object branch
  (`configs/default_fine_s.py`, `configs/dtu_e2e/*.py`),
* SPARF `get_config()` + `override_options` for the scene branch
  (`lib/bg_nerf/train_settings/**`).

Semantic knobs keep their reference names so configs are auditable
side-by-side. Presets live in `poseprobe_tpu/config/presets/`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

from ..models.object_sdf import ObjectConfig
from ..models.scene_nerf import SceneConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    datadir: str = ""
    dataset_type: str = "synthetic"     # dtu | blender | toy | custom | replica | scene_with_shapenet | synthetic
    selected_id: tuple = (22, 25, 28)   # train view ids (configs/dtu_e2e/scan1.py:19)
    test_id: Optional[tuple] = None
    inverse_y: bool = True
    flip_x: bool = False
    flip_y: bool = False
    white_bkgd: bool = False
    ndc: bool = False
    testskip: int = 1
    trainskip: int = 10
    near: float = 0.3
    far: float = 4.0
    xyz_min: tuple = (-0.4, -0.4, -0.5)
    xyz_max: tuple = (0.4, 0.4, 0.3)
    # matcher knobs (configs/dtu_e2e/scan1.py:22-32)
    max_keypoints: int = 512
    max_matcher: int = 256
    match_threshold: float = 0.2
    exclude_test: tuple = ()


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    noise: float = 0.0
    barf_c2f: Optional[tuple] = (0.6, 1.0)   # object-branch c2f window
    incremental: bool = True
    incremental_step: int = 800
    # gauge anchor: None = reference behavior (fixed in PnP mode, free in
    # noisy-GT mode); True/False overrides. Fixing pose 0 removes the gauge
    # freedom and speeds up short-horizon pose convergence.
    fix_first_pose: Optional[bool] = None
    # mid-training re-registration (TPU rebuild extension, None = off =
    # reference behavior): at step = ratio * max_iter, re-run the PnP chain
    # for every view i >= 1 against depth rendered by the (by then converged)
    # scene NeRF at the previous view's match pixels, replacing poses_pnp and
    # zeroing the refinement rows. Classical incremental-SfM re-registration:
    # snaps the per-view translation errors injected by activation-time PnP
    # against the scale-ambiguous probe SDF (see logs/run_journal).
    reregister_at_ratio: Optional[float] = None
    # activation-time pose warmup (TPU rebuild extension, 0 = off =
    # reference behavior): after PnP-initialising a newly activated view,
    # run this many photometric pose-only Adam steps against the current
    # scene (the test-time pose-optim machinery, `renderer.py:1312-1337`,
    # applied at activation) before joint training touches the view.
    activation_pose_warmup: int = 0
    activation_warmup_lr: float = 3e-3
    # gate the warmup on PnP's own quality: when > 0, the warmup only runs if
    # the PnP median reprojection error (px) exceeds this value (or PnP fell
    # back). Instrumented runs show warmup consistently degrades already-good
    # PnP poses (t x100 ~5 -> 20-48 at early activations, where the BARF-
    # masked render is too blurry to align against) while rescuing bad ones
    # (view-5 R 16.6 -> 3.8 deg). 0 = warmup always runs (legacy behavior).
    activation_warmup_gate_px: float = 0.0
    # photometric second opinion on the px gate (0 = off): a PnP pose can
    # reproject tightly yet be far off when the match spread is shallow
    # (observed: view-5 med_reproj 0.4px but rel-pose R 6.8deg, t 27). When
    # > 0, a gate-skipped warmup is re-armed if the new view's fixed-ray
    # photometric MSE exceeds `ratio * MSE(previous, already-trained view)`.
    # Whenever the warmup runs, its result is only ACCEPTED if it scores
    # better than the PnP pose on the same fixed rays (guarded warmup).
    activation_warmup_photo_ratio: float = 0.0
    # geometric second opinion (0 = off, recommended over the photometric
    # one): re-arm a gate-skipped warmup when PnP's holdout cross-validation
    # error (solve on half the anchors, score on the other half —
    # pnp._holdout_reproj) exceeds this many px. Unlike the photometric
    # ratio it never fires on well-constrained solves, so good PnP poses are
    # left untouched (instrumented: the photo ratio re-armed warmup on good
    # poses and the blurry-render alignment damaged them, t 3.5 -> 37.5).
    activation_warmup_holdout_px: float = 0.0
    # match-anchor acceptance guard on the warmup result (round-5, default
    # ON): accept a photometrically-better warmup pose only if its median
    # reprojection over the activation's own PnP anchors stays within
    # max(this_ratio x med_pnp, match_guard_px_floor). The photometric score
    # CAN prefer a corrupted pose (the scene generalizes poorly at a new
    # view, so mse improves while the pose diverges — observed t 3.5 -> 24
    # x100, which then evaporated the probe); the match geometry cannot
    # co-adapt. 0 disables.
    activation_warmup_match_guard: float = 3.0
    match_guard_px_floor: float = 3.0
    # activation-time single-view match refinement (round-5, default ON):
    # LM over the new view's 6-dof pose on its own match packs against the
    # trusted views (pose_init/ba.refine_view_matches), accepted when the
    # converged median residual <= this gate (px). Recovers degenerate
    # PnP solves (self-consistent anchors, 6-12 deg off) that both the
    # photometric and holdout referees miss. 0 disables.
    activation_match_refine_px: float = 1.0
    # warmup optimizes rotation only (pure-rotation w2c refine keeps the
    # camera center at PnP's solution): the warmup reliably fixes
    # orientation but injects along-view translation against blurry renders;
    # rotation must be right before its window closes, translation heals.
    activation_warmup_rot_only: bool = False
    # soft camera-center anchor toward the warmup seed (PnP center); see
    # evaluator.test_time_pose_optim — fixes the warmup's depth-ambiguous
    # translation inflation without rot_only's frozen-center failure mode
    activation_warmup_center_anchor: float = 0.0
    # catastrophic-PnP rescue tournament (0 = off): RANSAC occasionally
    # draws a degenerate solve that fits its anchors at sub-pixel error yet
    # is wildly wrong (observed: med_reproj 0.3px but rel-pose R 35deg,
    # t x100 126 — outside the photometric warmup's basin, so nothing
    # downstream recovers and the whole run is lost). When > 0: after the
    # warmup logic settles on a pose, if its fixed-ray photometric MSE still
    # exceeds `ratio * MSE(previous, already-trained view)`, fall back to
    # candidates anchored at the previous view's pose (raw + full-SE3
    # warmup) and keep the photometric argmin. Never fires on healthy
    # activations (their MSE passes the ratio), so it cannot degrade them.
    activation_rescue_ratio: float = 0.0
    # match-based bundle-adjustment pose polish (pose_init/ba.py; TPU rebuild
    # extension, () = off = reference behavior): at each step =
    # ratio * max_iter, triangulate the load-time match packs (chain +
    # (i-2, i) skip pairs) from the current poses and LM-refine every
    # non-anchor view against them. Unlike scene-depth re-registration
    # (harmful: the scene co-adapts to wrong poses, README_r3 queue20), the
    # matches are independent of the renderer, so the polish breaks the
    # self-consistent translation distortion that plateaus 6-view runs at
    # t x100 ~4. Schedule inside the pose window so joint training can
    # absorb the snap.
    ba_at_ratios: tuple = ()


@dataclasses.dataclass(frozen=True)
class PnPConfig:
    use_pnp: bool = True
    use_identical: bool = False
    ransac: bool = True
    # 3D-anchor source for activation-time PnP: "object" = probe-SDF surface
    # query (reference behavior, `recon_scene.py:276-310`); "scene" = depth
    # rendered by the scene NeRF at the previous view's match pixels — same
    # gauge as the already-calibrated poses, avoiding the probe's scale
    # ambiguity (TPU rebuild extension; see pose_init/pnp.py docstring);
    # "object_scaled" = probe anchors with their camera distances rescaled by
    # the median scene-depth/probe-depth ratio (probe geometry, scene gauge).
    anchor: str = "object"


@dataclasses.dataclass(frozen=True)
class ObjectTrainConfig:
    """surf_train block (`configs/dtu_e2e/scan1.py:54-105`)."""

    N_iters: int = 10000
    N_rand: int = 1024
    lrate_decay: int = 10               # lr *= 0.1^(1/(decay*1000)) per step
    # per-module learning rates; 0 => frozen (utils.py:316-342)
    lrate_sdf: float = 0.1
    lrate_k0: float = 0.1
    lrate_rgbnet: float = 1e-3
    lrate_warpnet: float = 1e-3
    lrate_sdf_alpha: float = 1e-2
    lrate_sdf_beta: float = 1e-2
    # staged multiplicative lr drops (scan1.py:93-96)
    decay_step_module: tuple = ((5000, (("sdf", 0.1), ("sdf_beta", 0.1), ("sdf_alpha", 0.1))),
                                (10000, (("sdf", 0.5), ("sdf_beta", 0.5), ("sdf_alpha", 0.5))))
    # loss weights
    weight_main: float = 1.0
    weight_mask: float = 0.1
    weight_tv_k0: float = 0.01
    weight_tv_density: float = 0.005
    sdf_tv: float = 0.1
    smooth_grad_tv: float = 0.05
    tv_updates: tuple = ((4000, (("sdf_tv", 0.1), ("smooth_grad_tv", 0.2))),)
    weight_surface_projection: float = 0.0
    projection_dis_error: float = 0.001
    weight_near_surface: float = 0.1
    # deform-prior (grad_deform/sdf_correct/sdf_deform) dynamic weight
    # endpoints, exp-decayed over the object phase (`lib/losses.py:30-32,54-63`
    # hardcodes 1e-1 -> 1e-3; exposed here for non-cube probe studies where
    # the priors pin the cube init)
    weight_deform_prior_init: float = 1e-1
    weight_deform_prior_final: float = 1e-3
    # progressive grid scaling checkpoints (`configs/default_fine_s.py:70`,
    # `configs/dtu_e2e/fine.py:24`): training starts at
    # num_voxels / 2^len(pg_scale) and doubles the voxel count at each step
    # listed here (DVGO semantics; one recompile per event).
    pg_scale: tuple = ()
    # boundary-shell SDF positivity prior: penalizes raw SDF < shell_margin
    # on the grid's outer voxel shell. Blocks the non-cube-probe "filled box"
    # basin (probe inflates to its bbox, mesh extraction empty) while staying
    # inactive for healthy geometry; see losses/object.shell_positivity_loss.
    weight_shell: float = 0.0
    shell_margin: float = 0.0
    # free-space-skip mask refresh cadence (steps); the occupancy cache is
    # rebuilt from the current SDF grid (adaptive, vs the reference's frozen
    # coarse-stage MaskCache)
    maskcache_update_every: int = 1000
    # pose optimizer (object side; 0 => frozen like scan1.py:83-85)
    lr_pose: float = 0.0
    lr_pose_end: float = 0.0
    ray_sampler: str = "semantic"       # semantic 20/30/50 bg/boundary/object split
    # default-ON end-of-object-phase probe invariant (round-4 verdict weak #2:
    # a 20k-step flagship run trained with a fully evaporated probe — frac_neg
    # 0 by step ~200 — and still "passed"; the probe is the paper's thesis, so
    # a run where it dies must abort loudly, not count as a pass). The trainer
    # raises ProbeHealthError at the phase end on the evaporation
    # (frac_neg ~ 0) or filled-box (frac_neg ~ 1) signatures.
    probe_health_check: bool = True


@dataclasses.dataclass(frozen=True)
class SceneTrainConfig:
    """Live subset of the SPARF opt tree (`train_settings/**`)."""

    max_iter: int = 60000
    lr: float = 5e-4
    lr_end: float = 1e-4
    lr_pose: float = 1e-3
    lr_pose_end: float = 1e-4
    ratio_end_joint_nerf_pose_refinement: float = 0.3
    # TPU-rebuild extension (None = reference behavior): when set past the
    # rotation window above, the se3 ROTATION dims freeze at the window end
    # while the TRANSLATION dims keep refining until this ratio. Motivated by
    # the measured joint dynamics (logs/run_journal): fine-phase pose
    # gradients heal translation (probe-gauge injection) but jitter rotation;
    # coarse-only windows keep R clean but never recover t.
    ratio_end_pose_trans: Optional[float] = None
    nerf_gradient_clipping: float = 0.1     # clip by norm
    pose_gradient_clipping: Optional[float] = None
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    depth_regu_patch_size: int = 2
    huber_photometric: bool = True
    diff_loss_type: str = "huber"
    # log10 loss weights (dtu/sparf.py:70-76); None disables a term
    loss_weight: tuple = (("render", 0.0), ("corres", -2.0), ("depth_cons", -3.0),
                          ("depth_patch", -2.0), ("fea_cons", None), ("fg_mask", None),
                          ("distortion", None))
    start_ratio_depth_cons: Optional[float] = 0.3
    gradually_decrease_corres_weight: bool = True
    iter_start_decrease_corres_weight: int = 0
    corres_weight_reduct_at_x_iter: int = 5000
    # eval
    test_photo: bool = True
    test_iter: int = 100
    # scene ray-sampler fractions (`sampling_strategies.py:146-167`,
    # `default_config.py:132-133`): fg-mask wins over center when both set
    sampled_fraction_in_center: float = 0.0
    sample_fraction_in_fg_mask: float = 0.0

    def loss_weight_dict(self) -> dict:
        return dict(self.loss_weight)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    expname: str = "exp"
    basedir: str = "./logs"
    data: DataConfig = DataConfig()
    camera: CameraConfig = CameraConfig()
    pnp: PnPConfig = PnPConfig()
    object_model: ObjectConfig = ObjectConfig()
    object_train: ObjectTrainConfig = ObjectTrainConfig()
    scene_model: SceneConfig = SceneConfig()
    scene_train: SceneTrainConfig = SceneTrainConfig()
    seed: int = 0
    # logging cadence (run.py:62-91)
    i_print: int = 200
    i_validate: int = 5000
    i_validate_mesh: int = 2000
    world_bound_scale: float = 1.5      # recon_scene.py:132


def replace(cfg, **kwargs):
    """Dataclass-aware override helper (the `_base_` inheritance analog)."""
    return dataclasses.replace(cfg, **kwargs)


def max_iter_for(dataset_type: str, n_train: int) -> int:
    """Iteration budget by dataset/views (`define_trainer.py:41-60`)."""
    if dataset_type in ("dtu", "replica", "toy", "scene_with_shapenet", "synthetic", "blender"):
        return {2: 60000, 3: 60000, 6: 150000}.get(n_train, 80000)
    # llff-style
    return {2: 60000, 3: 100000, 6: 170000}.get(n_train, 220000)
