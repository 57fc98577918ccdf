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

    @pytest.mark.parametrize("probe", ["cube", "sphere"])
    def test_synthetic_gt_chamfer_protocol(self, probe):
        """The hermetic DTU-protocol analog: an exact SDF volume of the probe,
        marching-tets extracted, must chamfer ~0 against the analytic GT
        surface samples (eval.py --eval_mesh on synthetic runs)."""
        from poseprobe_tpu.data import synthetic as synth_mod
        from poseprobe_tpu.eval import dtu_protocol
        half, n = 0.35, 48
        ax = np.linspace(-0.6, 0.6, n)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        p = np.stack([X, Y, Z], -1).reshape(-1, 3)
        vol = -synth_mod._probe_sdf(p, half, probe).reshape(n, n, n)
        verts, tris = mesh.extract_mesh_world(vol, [-0.6] * 3, [0.6] * 3)
        gt = synth_mod.probe_surface_points(20_000, half=half, probe=probe)
        res = dtu_protocol.evaluate_mesh_dtu(verts, tris, gt, n_samples=20_000,
                                             max_dist=0.5)
        # voxel size 1.2/47 = 0.0255; trilinear surface sits well inside one
        assert res["overall"] < 0.02, res

    def test_empty_mesh_scored_as_failure(self):
        """A degenerate SDF with no zero crossing (sphere filled-box basin,
        logs/run_journal/README_r3.md queue38) must score max_dist, not
        crash: sample_mesh_surface returns [0,3], evaluate_mesh_dtu flags
        empty_mesh."""
        from poseprobe_tpu.eval import dtu_protocol
        vol = np.full((8, 8, 8), 2.0)  # all "inside", no crossing
        verts, tris = mesh.extract_mesh_world(vol, [-1] * 3, [1] * 3)
        assert len(verts) == 0
        assert mesh.sample_mesh_surface(verts, tris, 100).shape == (0, 3)
        gt = np.random.RandomState(0).randn(50, 3)
        res = dtu_protocol.evaluate_mesh_dtu(verts, tris, gt, max_dist=0.5)
        assert res["empty_mesh"] and res["overall"] == 0.5

    def test_observation_mask_culling(self):
        """visual_hull_cull keeps probe-surface points and rejects
        unobserved-region garbage; visible_in_any_view keeps the observed
        front of the probe and drops the self-occluded back side."""
        from poseprobe_tpu.data import synthetic as synth_mod
        from poseprobe_tpu.eval import dtu_protocol
        data = synth_mod.make_synthetic_scene(n_train=3, n_test=0, H=48, W=48)
        tr = data.i_train
        surf = synth_mod.probe_surface_points(2000, seed=1)
        keep = dtu_protocol.visual_hull_cull(
            surf, data.masks[tr], data.poses_gt_w2c[tr], data.Ks[tr])
        assert keep.mean() > 0.95  # real surface survives the hull
        # a 3-view hull is a prism along the (narrow-arc) view axis: it can
        # only cull garbage that leaves the silhouette LATERALLY (x/y), not
        # along the viewing direction — assert exactly that
        rng = np.random.default_rng(0)
        lateral = rng.uniform(-0.55, 0.55, (2000, 3))
        lateral = lateral[np.abs(lateral[:, :2]).max(1) > 0.48]
        keep_j = dtu_protocol.visual_hull_cull(
            lateral, data.masks[tr], data.poses_gt_w2c[tr], data.Ks[tr])
        # (a few far-side points survive: perspective shrinks their
        # projection back inside the silhouette — physically correct)
        assert keep_j.mean() < 0.2
        # cameras sit on the -z side: the probe's -z face is observed,
        # the +z face is self-occluded
        front = surf[surf[:, 2] < -0.3]
        back = surf[surf[:, 2] > 0.3]
        seen_f = dtu_protocol.visible_in_any_view(
            front, data.depth_gt[tr], data.poses_gt_w2c[tr], data.Ks[tr])
        seen_b = dtu_protocol.visible_in_any_view(
            back, data.depth_gt[tr], data.poses_gt_w2c[tr], data.Ks[tr])
        assert seen_f.mean() > 0.8
        assert seen_b.mean() < 0.1

    def test_apply_sim3_points_matches_camera_center_map(self):
        """apply_sim3_points must use the SAME gauge map the prealigners apply
        to camera centers, so mesh verts land in GT units."""
        from poseprobe_tpu.core import align
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(3)
        R = Rotation.from_rotvec(rng.normal(0, 0.5, 3)).as_matrix()
        t, s = rng.normal(0, 1, 3), 1.7
        # GT c2w poses = sim3 applied to trained c2w poses
        def rand_pose():
            Rc = Rotation.from_rotvec(rng.normal(0, 0.5, 3)).as_matrix()
            return np.concatenate([Rc, rng.normal(0, 1, (3, 1))], 1)
        trained_c2w = np.stack([rand_pose() for _ in range(4)])
        gt_c2w = trained_c2w.copy()
        gt_c2w[:, :3, :3] = R[None] @ trained_c2w[:, :3, :3]
        gt_c2w[:, :3, 3] = (s * trained_c2w[:, :3, 3]) @ R.T + t
        inv = lambda P: np.stack([np.concatenate(
            [p[:3, :3].T, -p[:3, :3].T @ p[:3, 3:4]], 1) for p in P])
        aligned, sim3 = align.prealign_w2c_small_camera_systems(
            inv(trained_c2w), inv(gt_c2w))
        err = align.evaluate_camera_alignment(aligned, inv(gt_c2w))
        assert err["R"].max() < 1e-6 and err["t"].max() < 1e-6
        pts = rng.normal(0, 1, (100, 3))
        pts_gt = (s * pts) @ R.T + t
        np.testing.assert_allclose(align.apply_sim3_points(pts, sim3), pts_gt,
                                   atol=1e-8)


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


def test_filter_small_components():
    """Junk shells below the area threshold are dropped, the main component
    survives with vertices re-indexed (round-5: salt-noise SDF junk swamped
    the observation culls and d2s — eval meshes are cleaned + the kept
    fraction recorded)."""
    import numpy as np
    from poseprobe_tpu.eval import mesh as mesh_mod

    def quad(cx, s):
        v = np.array([[cx, 0, 0], [cx + s, 0, 0], [cx, s, 0],
                      [cx + s, s, 0]], np.float64)
        t = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
        return v, t

    v1, t1 = quad(0.0, 1.0)      # big component (area 1)
    v2, t2 = quad(5.0, 0.05)     # junk (area 0.0025)
    verts = np.concatenate([v1, v2])
    tris = np.concatenate([t1, t2 + 4])
    fv, ft, info = mesh_mod.filter_small_components(verts, tris,
                                                    min_area_frac=0.05)
    assert info["components"] == 2 and info["components_kept"] == 1
    assert len(fv) == 4 and len(ft) == 2
    assert ft.max() < len(fv)          # re-indexed
    assert np.isclose(info["kept_area_frac"], 1.0 / 1.0025, atol=1e-6)
    # both components above threshold: nothing dropped
    v3, t3 = quad(10.0, 0.9)
    verts2 = np.concatenate([v1, v3])
    tris2 = np.concatenate([t1, t3 + 4])
    _, ft2, info2 = mesh_mod.filter_small_components(verts2, tris2)
    assert info2["components_kept"] == 2 and len(ft2) == 4
