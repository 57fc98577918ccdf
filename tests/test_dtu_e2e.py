"""DTU-format loader -> trainer contract test.

Synthesizes a miniature DTU-layout dataset ON DISK (cameras.npz with
P = K @ w2c projection matrices decomposed by `load_K_Rt_from_P`, idr-style
mask pngs) from the hermetic synthetic scene, then drives the exact code path
of `python run.py --config presets/dtu_scan1.py`: `load_data` (dtu branch,
`lib/load_dtu.py:15-155` semantics) -> `JointTrainer.fit` -> a validation
render — de-risking the loader->trainer contract that no real DTU data can
exercise in this environment.
"""
import dataclasses
import os

import numpy as np
import pytest

import jax

from poseprobe_tpu.config.config import DataConfig
from poseprobe_tpu.data.loaders import load_data
from poseprobe_tpu.data.synthetic import make_synthetic_scene


def write_dtu_dataset(root: str, n_views: int = 10, H: int = 40, W: int = 40):
    """Write a DTU/IDR-layout dataset from the synthetic cube scene."""
    import imageio.v2 as imageio

    src = make_synthetic_scene(n_train=n_views, n_test=0, H=H, W=W, seed=3,
                               n_matches=32)
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    os.makedirs(os.path.join(root, "mask"), exist_ok=True)
    cams = {}
    for i in range(n_views):
        K44 = np.eye(4, dtype=np.float64)
        K44[:3, :3] = src.Ks[i]
        w2c44 = np.eye(4, dtype=np.float64)
        w2c44[:3, :4] = src.poses_gt_w2c[i]
        cams[f"world_mat_{i}"] = (K44 @ w2c44).astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        img = (np.clip(src.images[i], 0, 1) * 255).astype(np.uint8)
        m = (src.masks[i][..., 0] * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(root, "image", f"{i:06d}.png"), img)
        imageio.imwrite(os.path.join(root, "mask", f"{i:06d}.png"), m)
    np.savez(os.path.join(root, "cameras.npz"), **cams)
    return src


class TestDTUShapedE2E:
    def test_loader_decodes_poses_and_masks(self, tmp_path):
        src = write_dtu_dataset(str(tmp_path))
        cfg = DataConfig(datadir=str(tmp_path), dataset_type="dtu",
                         selected_id=(0, 1, 2), near=src.near, far=src.far,
                         max_matcher=32)
        data = load_data(cfg, matcher_backend="classical")
        # train views 0-2; test = remaining minus the DTU exclude list -> 8, 9
        assert data.n_train == 3
        assert len(data.i_test) == 2
        assert data.images.shape[1:] == (40, 40, 3)
        # P-matrix decomposition recovers the GT w2c poses
        for k in range(3):
            np.testing.assert_allclose(data.poses_gt_w2c[k], src.poses_gt_w2c[k],
                                       atol=1e-4)
            np.testing.assert_allclose(data.Ks[k], src.Ks[k], rtol=1e-4, atol=1e-3)
        # idr masks survive the png round-trip
        got = data.masks[0][..., 0] > 0.5
        want = src.masks[0][..., 0] > 0.5
        assert (got == want).mean() > 0.99

    @pytest.mark.slow
    def test_dtu_preset_code_path_trains(self, tmp_path):
        """Full run.py path at toy scale: dtu preset (shrunk) + on-disk DTU
        data + incremental PnP activation + 60 joint steps + validation."""
        from poseprobe_tpu.config import config as cfg_mod
        from poseprobe_tpu.config.presets import dtu_scan1
        from poseprobe_tpu.models.object_sdf import ObjectConfig
        from poseprobe_tpu.models.scene_nerf import SceneConfig
        from poseprobe_tpu.train.trainer import JointTrainer

        src = write_dtu_dataset(str(tmp_path))
        cfg = dtu_scan1.get_config(str(tmp_path))
        margin = float(src.xyz_max[0])
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, datadir=str(tmp_path),
                                     selected_id=(0, 1, 2), near=src.near,
                                     far=src.far, max_matcher=32),
            camera=dataclasses.replace(cfg.camera, incremental=True,
                                       incremental_step=20),
            object_model=ObjectConfig(
                xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
                num_voxels=16**3, num_voxels_base=16**3, N_iters=100,
                world_bound_scale=1.25),
            object_train=dataclasses.replace(cfg.object_train, N_iters=100,
                                             N_rand=64),
            scene_model=SceneConfig(
                layers_feat=(32,) * 4, layers_rgb=(16, 3), skip=(2,),
                L_3D=4, L_view=2, sample_intvs=16, sample_intvs_fine=16,
                rand_rays=96, max_iter=200, barf_c2f=(0.4, 0.7),
                fine_sampling=True, ratio_start_fine_sampling_at_x=0.3),
            scene_train=dataclasses.replace(cfg.scene_train, max_iter=200),
        )
        data = load_data(cfg.data, matcher_backend="classical")
        trainer = JointTrainer(cfg, data)
        hist = trainer.fit(60, log_every=20)
        assert trainer.state.n_active == 3  # incremental activation fired
        assert all(np.isfinite(h["loss_total"]) for h in hist)
        val = trainer.validate(n_views=1)
        assert np.isfinite(val)
