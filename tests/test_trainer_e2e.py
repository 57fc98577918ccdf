"""End-to-end joint training on the procedural synthetic scene (CPU-sized)."""
import dataclasses

import jax
import numpy as np
import pytest

from poseprobe_tpu.config import config as cfg_mod
from poseprobe_tpu.core import align
from poseprobe_tpu.data.synthetic import make_synthetic_scene
from poseprobe_tpu.models.object_sdf import ObjectConfig
from poseprobe_tpu.models.scene_nerf import SceneConfig
from poseprobe_tpu.train.trainer import JointTrainer


def tiny_config(data, max_iter=400, n_iters_obj=300, incremental_step=50):
    margin = float(data.xyz_max[0])
    return cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=True, incremental_step=incremental_step,
                                    barf_c2f=None),
        pnp=cfg_mod.PnPConfig(use_pnp=True),
        object_model=ObjectConfig(
            xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
            num_voxels=24**3, num_voxels_base=24**3,
            N_iters=n_iters_obj, barf_c2f=None, world_bound_scale=1.25,
            s_ratio=50.0, s_start=0.2,
        ),
        object_train=cfg_mod.ObjectTrainConfig(
            N_iters=n_iters_obj, N_rand=128, lrate_decay=10,
            decay_step_module=(), tv_updates=(),
            weight_tv_density=0.0, weight_tv_k0=0.0,
            projection_dis_error=0.001, weight_near_surface=0.1,
        ),
        scene_model=SceneConfig(
            layers_feat=(48,) * 4, layers_rgb=(24, 3), skip=(2,),
            L_3D=6, L_view=2, sample_intvs=24, sample_intvs_fine=24,
            rand_rays=192, max_iter=max_iter, barf_c2f=(0.1, 0.5),
            fine_sampling=True, ratio_start_fine_sampling_at_x=0.5,
        ),
        scene_train=cfg_mod.SceneTrainConfig(
            max_iter=max_iter, lr=5e-4, lr_end=1e-4,
            ratio_end_joint_nerf_pose_refinement=0.5,
            start_ratio_depth_cons=0.5,
            corres_weight_reduct_at_x_iter=200,
        ),
    )


@pytest.fixture(scope="module")
def scene_data():
    return make_synthetic_scene(n_train=3, n_test=1, H=40, W=40, seed=3)


class TestJointTrainer:
    def test_pnp_initialisation_reasonable(self, scene_data):
        cfg = tiny_config(scene_data)
        tr = JointTrainer(cfg, scene_data)
        # PnP against the *cube-initialized* SDF gives a coarse but sane pose
        pnp_poses = np.asarray(tr.state.poses_pnp)
        gt = scene_data.poses_gt_w2c[scene_data.i_train]
        aligned, _ = align.prealign_w2c_small_camera_systems(pnp_poses, gt)
        err = align.evaluate_camera_alignment(aligned, gt)
        assert float(err["R"].mean()) < 30.0  # degrees; cube-SDF anchors are approximate
        assert np.all(np.isfinite(pnp_poses))

    def test_short_joint_training_improves(self, scene_data):
        cfg = tiny_config(scene_data, max_iter=220, n_iters_obj=200, incremental_step=40)
        tr = JointTrainer(cfg, scene_data)
        hist = tr.fit(220, log_every=20)
        assert len(hist) > 0
        early = np.mean([h["psnr_scene"] for h in hist[:3]])
        late = np.mean([h["psnr_scene"] for h in hist[-3:]])
        assert late > early + 1.0, f"scene PSNR did not improve: {early:.2f} -> {late:.2f}"
        assert tr.state.n_active == 3  # incremental activation happened
        for h in hist:
            assert np.isfinite(h["loss_total"]), h

    def test_object_branch_psnr_improves(self, scene_data):
        cfg = tiny_config(scene_data, max_iter=150, n_iters_obj=150, incremental_step=30)
        tr = JointTrainer(cfg, scene_data)
        hist = tr.fit(150, log_every=10)
        obj = [h["psnr_obj"] for h in hist if "psnr_obj" in h]
        assert obj[-1] > obj[0], f"object PSNR fell: {obj[0]:.2f} -> {obj[-1]:.2f}"

    def test_checkpoint_roundtrip(self, scene_data, tmp_path):
        from poseprobe_tpu.train import state as state_mod
        cfg = tiny_config(scene_data, max_iter=60, n_iters_obj=50, incremental_step=20)
        tr = JointTrainer(cfg, scene_data)
        tr.fit(30)
        path = str(tmp_path / "ckpt.pkl")
        state_mod.save_checkpoint(path, tr.state, configs={"expname": "test"})
        tr2 = JointTrainer(cfg, scene_data)
        payload = state_mod.load_checkpoint(path)
        tr2.state = state_mod.restore_state(tr2.state, payload)
        assert tr2.state.step == 30
        np.testing.assert_allclose(np.asarray(tr2.state.obj_params["sdf_grid"]),
                                   np.asarray(tr.state.obj_params["sdf_grid"]))
        # training continues from the restored state
        tr2.fit(5)
        assert tr2.state.step == 35

    def test_full_image_render(self, scene_data):
        cfg = tiny_config(scene_data, max_iter=60, n_iters_obj=50)
        tr = JointTrainer(cfg, scene_data)
        tr.fit(10)
        out = tr.render_full_image(tr.poses_gt[0], tr.Ks[0], chunk=800, fine=False)
        assert out["rgb"].shape == (40, 40, 3)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))
