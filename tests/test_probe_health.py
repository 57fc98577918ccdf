"""Default-on end-of-object-phase probe invariant (round-4 verdict weak #2).

The probe is the method's thesis; `r4_6view_ba` trained 20k steps with a
fully evaporated probe (frac_neg 0 by step ~200) and still posted a passing
PSNR because warmup+BA carried the poses. These tests pin the guarantee that
such a run now ABORTS: the trainer raises ProbeHealthError at the object
phase end on the evaporation / filled-box raw-SDF signatures unless the
check is explicitly disabled.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from poseprobe_tpu.config import config as cfg_mod
from poseprobe_tpu.data.synthetic import make_synthetic_scene
from poseprobe_tpu.models.object_sdf import ObjectConfig
from poseprobe_tpu.models.scene_nerf import SceneConfig
from poseprobe_tpu.train.trainer import JointTrainer, ProbeHealthError


def _tiny_trainer(n_iters=2, probe_health_check=True):
    data = make_synthetic_scene(n_train=3, n_test=1, H=20, W=20, seed=0)
    margin = float(data.xyz_max[0])
    cfg = cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=False, barf_c2f=None),
        pnp=cfg_mod.PnPConfig(use_pnp=False),
        object_model=ObjectConfig(
            xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
            num_voxels=16**3, num_voxels_base=16**3, N_iters=n_iters,
            barf_c2f=None, world_bound_scale=1.25),
        object_train=cfg_mod.ObjectTrainConfig(
            N_iters=n_iters, N_rand=32, decay_step_module=(), tv_updates=(),
            weight_tv_density=0.0, weight_tv_k0=0.0,
            probe_health_check=probe_health_check),
        scene_model=SceneConfig(layers_feat=(16,) * 3, layers_rgb=(16, 3),
                                skip=(), L_3D=2, L_view=1, sample_intvs=8,
                                sample_intvs_fine=8, rand_rays=24,
                                max_iter=100, barf_c2f=None,
                                fine_sampling=False),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=100,
                                             start_ratio_depth_cons=None),
    )
    return JointTrainer(cfg, data, seed=0)


def _evaporate(t):
    """All-positive raw SDF: zero negative voxels = no interior."""
    g = t.state.obj_params["sdf_grid"]
    t.state.obj_params["sdf_grid"] = jnp.abs(g) + 0.1


def _fill_box(t):
    """All-negative raw SDF out to the bbox faces."""
    g = t.state.obj_params["sdf_grid"]
    t.state.obj_params["sdf_grid"] = -jnp.abs(g) - 0.1


def test_healthy_probe_passes():
    t = _tiny_trainer()
    stats = t.check_probe_health()   # cube init: a genuine interior
    assert stats["healthy"] and stats["n_neg"] >= 8


def test_evaporated_probe_raises_direct():
    t = _tiny_trainer()
    _evaporate(t)
    with pytest.raises(ProbeHealthError, match="EVAPORATED"):
        t.check_probe_health()


def test_filled_box_raises_direct():
    t = _tiny_trainer()
    _fill_box(t)
    with pytest.raises(ProbeHealthError, match="FILLED BOX"):
        t.check_probe_health()


@pytest.mark.slow
def test_fit_aborts_on_evaporated_probe_at_phase_end():
    """The host loop itself must fire the check when crossing N_iters."""
    t = _tiny_trainer(n_iters=2)
    _evaporate(t)
    with pytest.raises(ProbeHealthError):
        t.fit(5)
    # one-shot: the flag is consumed even though the check raised, so a
    # caller that deliberately catches the error can continue the run
    assert t._probe_checked


@pytest.mark.slow
def test_check_disabled_warns_but_continues():
    t = _tiny_trainer(n_iters=2, probe_health_check=False)
    _evaporate(t)
    stats = t.check_probe_health()
    assert not stats["healthy"]      # measured, reported, not raised
    t.fit(5)                         # and fit crosses the boundary fine
    assert t.state.step >= 5


@pytest.mark.slow
def test_activation_stack_with_refine_and_guard():
    """Activation pipeline integration (round-5): PnP -> (gated, match-
    guarded) warmup -> match refinement, across two activations of a tiny
    incremental run. In the round-5 collapse post-mortem the warmup
    corrupted near-exact poses (photometric mse preferred them); here the
    refine stage must leave the final activation error at the match-
    geometry level regardless."""
    from poseprobe_tpu.data.synthetic import make_synthetic_scene
    from poseprobe_tpu.models.object_sdf import ObjectConfig
    from poseprobe_tpu.models.scene_nerf import SceneConfig
    from poseprobe_tpu.train.trainer import JointTrainer

    data = make_synthetic_scene(n_train=3, n_test=1, H=24, W=24, seed=0)
    margin = float(data.xyz_max[0])
    cfg = cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=True, incremental_step=4,
                                    barf_c2f=None, activation_pose_warmup=5,
                                    activation_warmup_photo_ratio=4.0),
        pnp=cfg_mod.PnPConfig(use_pnp=True),
        object_model=ObjectConfig(xyz_min=(-margin,) * 3,
                                  xyz_max=(margin,) * 3,
                                  num_voxels=16**3, num_voxels_base=16**3,
                                  N_iters=50, barf_c2f=None,
                                  world_bound_scale=1.25),
        object_train=cfg_mod.ObjectTrainConfig(
            N_iters=50, N_rand=32, decay_step_module=(), tv_updates=(),
            weight_tv_density=0.0, weight_tv_k0=0.0),
        scene_model=SceneConfig(layers_feat=(16,) * 3, layers_rgb=(16, 3),
                                skip=(), L_3D=2, L_view=1, sample_intvs=8,
                                sample_intvs_fine=8, rand_rays=24,
                                max_iter=100, barf_c2f=None,
                                fine_sampling=False),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=100,
                                             start_ratio_depth_cons=None),
    )
    t = JointTrainer(cfg, data, seed=0)
    t.fit(10, log_every=2)  # activations at steps 4 and 8
    assert t.state.n_active == 3
    # the settled activation poses sit at match-geometry accuracy
    from poseprobe_tpu.core import align as align_mod
    cur = t.current_pose_host()
    aligned, _ = align_mod.prealign_w2c_small_camera_systems(
        cur, t.poses_gt)
    err = align_mod.evaluate_camera_alignment(aligned, t.poses_gt)
    # mechanics check, not a precision benchmark: at 24-px images the
    # rescue-only px gates are coarse relative to pose error
    assert float(np.asarray(err["R"]).max()) < 2.0
    assert float(np.asarray(err["t"]).max()) < 10.0
