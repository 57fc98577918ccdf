"""Tests for data loaders' pure parsing pieces, metrics, mesh, and matching."""
import json
import os

import numpy as np
import pytest

from poseprobe_tpu.data import base as data_base
from poseprobe_tpu.data.loaders import load_K_Rt_from_P, load_blender, load_toy
from poseprobe_tpu.config.config import DataConfig
from poseprobe_tpu.eval import mesh, metrics
from poseprobe_tpu.pose_init import matching


class TestProjectionDecomposition:
    def test_load_K_Rt_roundtrip(self):
        rng = np.random.default_rng(0)
        K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]])
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec(rng.normal(0, 0.4, 3)).as_matrix()
        t = rng.normal(0, 1, 3)
        P = K @ np.concatenate([R, t[:, None]], 1)
        K2, pose_c2w = load_K_Rt_from_P(P.astype(np.float32))
        np.testing.assert_allclose(K2, K / K[2, 2], atol=1e-3)
        np.testing.assert_allclose(pose_c2w[:3, :3], R.T, atol=1e-4)
        np.testing.assert_allclose(pose_c2w[:3, 3], -R.T @ t, atol=1e-3)


class TestMesh:
    def test_sphere_surface(self):
        n = 32
        ax = np.linspace(-1, 1, n)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        vol = 0.5 - np.sqrt(X**2 + Y**2 + Z**2)
        verts, tris = mesh.marching_cubes(vol, 0.0)
        assert len(verts) > 100 and len(tris) > 100
        verts_w, _ = mesh.extract_mesh_world(vol, [-1, -1, -1], [1, 1, 1])
        r = np.linalg.norm(verts_w, axis=1)
        assert abs(r.mean() - 0.5) < 0.02

    def test_chamfer_known_offset(self):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, (5000, 3)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b = a * 1.1
        _, _, ch = mesh.chamfer_distance(a, b)
        assert abs(ch - 0.1) < 0.02

    def test_ply_export(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        path = str(tmp_path / "mesh.ply")
        mesh.save_ply(path, verts, tris)
        content = open(path).read()
        assert "element vertex 3" in content and "element face 1" in content


class TestMetrics:
    def test_psnr(self):
        import jax.numpy as jnp
        a = jnp.zeros((8, 8, 3))
        b = jnp.ones((8, 8, 3)) * 0.1
        np.testing.assert_allclose(float(metrics.psnr(a, b)), 20.0, atol=1e-3)

    def test_ssim_identity(self):
        import jax
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(metrics.ssim(img, img)) > 0.999

    def test_ssim_degrades(self):
        import jax
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = img + jax.random.normal(jax.random.PRNGKey(1), img.shape) * 0.2
        assert float(metrics.ssim(img, noisy)) < float(metrics.ssim(img, img))

    def test_lpips_gated(self):
        assert not metrics.lpips_available() or os.environ.get("POSEPROBE_LPIPS_WEIGHTS")

    def test_depth_abs_rmse(self):
        """Mirrors `compute_depth_error_on_rays` (`metrics.py:123-134`):
        invalid (0) GT dropped, pred scaled by the sim3 est->GT factor."""
        gt = np.array([2.0, 4.0, 0.0, 1.0])      # third pixel invalid
        pred = np.array([1.0, 2.0, 9.0, 0.5])    # exactly gt/2
        abs_e, rmse = metrics.depth_abs_rmse(pred, gt, scale=2.0)
        assert abs_e == 0.0 and rmse == 0.0
        abs_e, rmse = metrics.depth_abs_rmse(pred, gt, scale=1.0)
        np.testing.assert_allclose(abs_e, (1.0 + 2.0 + 0.5) / 3)
        np.testing.assert_allclose(rmse, np.sqrt((1 + 4 + 0.25) / 3))
        a, r = metrics.depth_abs_rmse(pred, np.zeros(4))  # nothing valid
        assert np.isnan(a) and np.isnan(r)

    def test_synthetic_depth_gt_is_camera_z(self):
        """The synthetic scene's depth_gt uses the renderer's convention
        (ray parameter with camera-z = 1, i.e. camera-z depth): the center
        pixel of each view sees the near cube face at ~|cam| - cube_half."""
        from poseprobe_tpu.data.synthetic import make_synthetic_scene

        data = make_synthetic_scene(n_train=3, n_test=1, H=32, W=32, seed=0)
        assert data.depth_gt is not None and data.depth_gt.shape == (4, 32, 32)
        assert (data.depth_gt > 0).all()
        for v in range(3):
            R, t = data.poses_gt_w2c[v, :, :3], data.poses_gt_w2c[v, :, 3]
            cam = -R.T @ t
            d_center = data.depth_gt[v, 16, 16]
            assert data.masks[v, 16, 16, 0] == 1.0   # cube covers the center
            assert abs(d_center - (np.linalg.norm(cam) - 0.35)) < 0.1


    def test_synthetic_sphere_probe(self):
        """probe="sphere": a non-cube probe so the deformation field has real
        work adapting the cube-SDF init. The scene must stay geometrically
        consistent: matches on the sphere surface, center-pixel depth =
        |cam| - radius, masks smaller than the circumscribing cube's."""
        from poseprobe_tpu.data.synthetic import make_synthetic_scene

        data = make_synthetic_scene(n_train=3, n_test=1, H=32, W=32, seed=0,
                                    probe="sphere")
        cube = make_synthetic_scene(n_train=3, n_test=1, H=32, W=32, seed=0)
        assert 0 < data.masks[:3].mean() < cube.masks[:3].mean()
        for v in range(3):
            R, t = data.poses_gt_w2c[v, :, :3], data.poses_gt_w2c[v, :, 3]
            cam = -R.T @ t
            assert data.masks[v, 16, 16, 0] == 1.0
            assert abs(data.depth_gt[v, 16, 16] - (np.linalg.norm(cam) - 0.35)) < 0.1
        # object matches backproject onto the sphere: pixel in view j at the
        # rendered depth must be ~0.35 from the origin
        j = int(data.pair_j[1])
        m = data.obj_matches[1]
        sel = m[:, 4] > 0
        assert sel.sum() >= 64
        px = m[sel, 0:2]
        K = data.Ks[j]
        xi = np.clip(px[:, 0].astype(int), 0, 31)
        yi = np.clip(px[:, 1].astype(int), 0, 31)
        t_ray = data.depth_gt[j, yi, xi]
        dirs = np.stack([(xi + 0.5 - K[0, 2]) / K[0, 0],
                         (yi + 0.5 - K[1, 2]) / K[1, 1],
                         np.ones_like(t_ray)], -1)
        R, t = data.poses_gt_w2c[j, :, :3], data.poses_gt_w2c[j, :, 3]
        cam_pts = dirs * t_ray[:, None]
        world = (cam_pts - t) @ R
        r = np.linalg.norm(world, axis=-1)
        assert np.median(np.abs(r - 0.35)) < 0.05, np.median(r)


class TestMatching:
    def test_classical_matcher_on_shifted_texture(self):
        rng = np.random.default_rng(2)
        base_img = rng.random((96, 96, 3)).astype(np.float32)
        # smooth it a bit so SIFT finds blobs
        from scipy.ndimage import gaussian_filter
        base_img = gaussian_filter(base_img, (2, 2, 0))
        base_img = (base_img - base_img.min()) / (np.ptp(base_img) + 1e-9)
        shift = 5
        img_j = base_img
        img_i = np.roll(base_img, shift, axis=1)
        pack = matching.match_pair_classical(img_i, img_j, None, max_matcher=128)
        valid = pack[:, 4] > 0
        assert valid.sum() >= 8
        dx = pack[valid, 2] - pack[valid, 0]
        # median displacement should equal the shift
        assert abs(np.median(dx) - shift) < 1.5

    def test_pack_shape_and_padding(self):
        img = np.zeros((32, 32, 3), np.float32)  # featureless -> all padding
        pack = matching.match_pair_classical(img, img, None, max_matcher=64)
        assert pack.shape == (64, 5)
        assert (pack[:, 4] == 0).all()


class TestBlenderToyLoaders:
    def _write_blender_dataset(self, root, n=3, H=20, W=20, with_instance=False):
        os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
        import imageio.v2 as imageio
        rng = np.random.default_rng(0)
        for split in ("train", "val", "test"):
            frames = []
            for k in range(n):
                name = f"imgs/{split}_{k}"
                img = (rng.random((H, W, 4)) * 255).astype(np.uint8)
                img[..., 3] = 255
                imageio.imwrite(os.path.join(root, name + ".png"), img)
                if with_instance:
                    inst = np.zeros((H, W), np.uint8)
                    inst[5:15, 5:15] = 1
                    imageio.imwrite(os.path.join(root, name + ".instance.png"), inst)
                c2w = np.eye(4)
                c2w[2, 3] = 3.0 + k * 0.1
                frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
            meta = {"camera_angle_x": 0.8, "frames": frames}
            with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
                json.dump(meta, f)

    def test_load_blender(self, tmp_path):
        self._write_blender_dataset(str(tmp_path))
        cfg = DataConfig(datadir=str(tmp_path), dataset_type="blender",
                         selected_id=(0, 1, 2), trainskip=1)
        data = load_blender(cfg, matcher_backend="classical")
        assert data.images.shape[0] == 9
        assert data.n_train == 3
        assert data.obj_matches.shape == (3, cfg.max_matcher, 5)
        assert np.isfinite(data.poses_gt_w2c).all()

    def test_load_toy(self, tmp_path):
        self._write_blender_dataset(str(tmp_path), with_instance=True)
        cfg = DataConfig(datadir=str(tmp_path), dataset_type="toy",
                         selected_id=(0, 1), test_id=(6, 7))
        data = load_toy(cfg, matcher_backend="classical")
        assert data.masks.max() == 1.0
        assert data.n_train == 2


class TestMoreLoaders:
    def _write_replica(self, root, n=4, H=24, W=24):
        import imageio.v2 as imageio
        os.makedirs(os.path.join(root, "results"), exist_ok=True)
        rng = np.random.default_rng(0)
        traj = []
        for k in range(n):
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(root, "results", f"frame{k:06d}.jpg"), img)
            depth = (rng.random((H, W)) * 20000 + 1000).astype(np.uint16)
            imageio.imwrite(os.path.join(root, "results", f"depth{k:06d}.png"), depth)
            c2w = np.eye(4)
            c2w[2, 3] = -2.0 - 0.1 * k
            traj.append(c2w.reshape(-1))
        np.savetxt(os.path.join(root, "traj.txt"), np.stack(traj))

    def test_load_replica(self, tmp_path):
        from poseprobe_tpu.data.loaders import load_replica
        self._write_replica(str(tmp_path))
        cfg = DataConfig(datadir=str(tmp_path), dataset_type="replica",
                         selected_id=(0, 1), test_id=(2, 3))
        data = load_replica(cfg, matcher_backend="classical")
        assert data.n_train == 2
        assert data.masks.min() >= 0 and data.masks.max() <= 1
        assert np.isfinite(data.poses_gt_w2c).all()
        # GT depth carried through for the depth metrics (load_replica.py
        # depth*.png / 6553.5), camera-z convention, 0 = invalid
        assert data.depth_gt is not None and data.depth_gt.shape == data.images.shape[:3]
        assert data.depth_gt.min() > 0.1  # fixture depths in [1000, 21000]/6553.5

    def test_load_shapenet_scene(self, tmp_path):
        import imageio.v2 as imageio
        import json as json_mod
        from poseprobe_tpu.data.loaders import load_scene_with_shapenet
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "colors"), exist_ok=True)
        os.makedirs(os.path.join(root, "mask"), exist_ok=True)
        rng = np.random.default_rng(1)
        for split, n in (("train", 3), ("val", 1), ("test", 2)):
            frames = []
            for k in range(n):
                name = f"colors/{split}_{k}"
                img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
                imageio.imwrite(os.path.join(root, name + ".png"), img)
                m = np.zeros((20, 20), np.uint8)
                m[6:14, 6:14] = 255
                imageio.imwrite(os.path.join(root, name.replace("colors", "mask") + ".png"), m)
                c2w = np.eye(4)
                c2w[2, 3] = 2.5 + 0.1 * k
                frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
            with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
                json_mod.dump({"camera_angle_x": 0.7, "frames": frames}, f)
        cfg = DataConfig(datadir=root, dataset_type="scene_with_shapenet",
                         selected_id=(0, 1, 2), test_id=(4, 5))
        data = load_scene_with_shapenet(cfg, matcher_backend="classical")
        assert data.n_train == 3
        assert data.masks.max() == 1.0

    def test_load_custom(self, tmp_path):
        import imageio.v2 as imageio
        from poseprobe_tpu.data.loaders import load_custom
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "scene_image"), exist_ok=True)
        os.makedirs(os.path.join(root, "scene_mask"), exist_ok=True)
        rng = np.random.default_rng(2)
        n = 4
        w2c = np.tile(np.eye(4)[None], (n, 1, 1)).astype(np.float32)
        w2c[:, 2, 3] = np.linspace(2, 2.3, n)
        np.save(os.path.join(root, "w2c.npy"), w2c)
        np.savetxt(os.path.join(root, "intrinsics.txt"),
                   np.array([[20.0, 0, 10], [0, 20.0, 10], [0, 0, 1]]))
        for k in range(n):
            img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(root, "scene_image", f"{k:05d}.jpg"), img)
            m = np.zeros((20, 20), np.uint8)
            m[5:15, 5:15] = 255
            imageio.imwrite(os.path.join(root, "scene_mask", f"{k:05d}.jpg"), m)
        cfg = DataConfig(datadir=root, dataset_type="custom", selected_id=(0, 2))
        data = load_custom(cfg, matcher_backend="classical")
        assert data.n_train == 2
        # reference quirk: test split covers ids up to max(selected_id) only
        # (`load_custom.py:207`), so id 3 is excluded
        assert list(data.i_test) == [1]
