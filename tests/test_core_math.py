"""Property tests for Lie math, pose ops, rays, projection, and alignment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseprobe_tpu.core import align, geometry, lie, pose, rays


def rand_se3(key, n, scale=0.5):
    return jax.random.normal(key, (n, 6)) * scale


class TestLie:
    def test_exp_log_roundtrip_so3(self):
        w = rand_se3(jax.random.PRNGKey(0), 8, scale=0.3)[:, :3]
        R = lie.so3_to_SO3(w)
        w2 = lie.SO3_to_so3(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)

    def test_exp_log_roundtrip_se3(self):
        wu = rand_se3(jax.random.PRNGKey(1), 8, scale=0.3)
        Rt = lie.se3_to_SE3(wu)
        wu2 = lie.SE3_to_se3(Rt)
        np.testing.assert_allclose(np.asarray(wu), np.asarray(wu2), atol=1e-3)

    def test_so3_orthonormal(self):
        R = lie.so3_to_SO3(rand_se3(jax.random.PRNGKey(2), 4)[:, :3])
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -2, -1)), np.asarray(eye), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)

    def test_zero_tangent_is_identity(self):
        Rt = lie.se3_to_SE3(jnp.zeros((1, 6)))
        np.testing.assert_allclose(np.asarray(Rt[0, :, :3]), np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(Rt[0, :, 3]), 0.0, atol=1e-7)

    def test_grad_through_exp_at_zero(self):
        # se3_refine starts at zero; gradient must be finite there
        g = jax.grad(lambda w: lie.se3_to_SE3(w).sum())(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_quaternion_roundtrip(self):
        R = lie.so3_to_SO3(rand_se3(jax.random.PRNGKey(3), 6)[:, :3])
        q = lie.R_to_quat(R)
        R2 = lie.quat_to_R(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_rotation_distance(self):
        w = jnp.array([[0.3, 0.0, 0.0]])
        R = lie.so3_to_SO3(w)
        d = lie.rotation_distance(R, jnp.eye(3)[None])
        np.testing.assert_allclose(np.asarray(d), 0.3, atol=1e-5)


class TestPose:
    def test_invert(self):
        wu = rand_se3(jax.random.PRNGKey(4), 5)
        p = lie.se3_to_SE3(wu)
        ident = pose.compose_pair(p, pose.invert(p))
        np.testing.assert_allclose(np.asarray(ident[..., :3]), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident[..., 3]), 0.0, atol=1e-5)

    def test_compose_matches_matmul(self):
        a = lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(5), 3))
        b = lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(6), 3))
        ab = pose.compose_pair(a, b)
        ab_ref = pose.unpad(pose.pad(b) @ pose.pad(a))
        np.testing.assert_allclose(np.asarray(ab), np.asarray(ab_ref), atol=1e-5)

    def test_world2cam_cam2world_roundtrip(self):
        p = lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(7), 2))
        X = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 3))
        Xc = pose.world2cam(X, p)
        Xw = pose.cam2world(Xc, p)
        np.testing.assert_allclose(np.asarray(X), np.asarray(Xw), atol=1e-4)

    def test_invert_4x4(self):
        p = pose.pad(lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(9), 4)))
        ident = pose.invert_4x4(p) @ p
        np.testing.assert_allclose(np.asarray(ident), np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)


class TestRays:
    def test_center_ray_projects_back(self):
        # unproject then reproject pixels -> identity
        H, W = 12, 16
        K = jnp.array([[[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1]]])
        w2c = lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(10), 1, scale=0.2))
        center, ray = rays.get_center_and_ray(w2c, H, W, K)
        pts3d = center + ray * 2.7  # arbitrary depth along the ray
        cam_pts = pose.world2cam(pts3d, w2c)
        px = geometry.project_to_cam(cam_pts, K)
        expected = rays.pixel_grid(H, W).reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(px[0]), np.asarray(expected), atol=1e-3)

    def test_get_rays_object_branch(self):
        H, W = 8, 8
        K = jnp.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
        c2w = pose.make(R=jnp.eye(3), t=jnp.zeros(3))
        ro, rd = rays.get_rays(H, W, K, c2w, inverse_y=True)
        assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
        # center pixel looks along +z for inverse_y camera at origin
        np.testing.assert_allclose(np.asarray(rd[4, 4]), [0.05, 0.05, 1.0], atol=1e-5)

    def test_pixel_ray_consistency(self):
        # get_center_and_ray_at_pixels must agree with the full grid version
        H, W = 6, 7
        K = jnp.array([[[9.0, 0, 3.5], [0, 9.0, 3.0], [0, 0, 1]]])
        w2c = lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(11), 1, scale=0.3))
        c_all, r_all = rays.get_center_and_ray(w2c, H, W, K)
        pix = jnp.array([[1.0, 2.0], [4.0, 5.0]])
        c_px, r_px = rays.get_center_and_ray_at_pixels(w2c, pix, K)
        idx = (pix[:, 1] * W + pix[:, 0]).astype(int)
        np.testing.assert_allclose(np.asarray(r_px[0]), np.asarray(r_all[0, idx]), atol=1e-5)


class TestGeometry:
    def test_project_backproject_roundtrip(self):
        K = jnp.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]])
        T = pose.pad(lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(12), 1, 0.2))[0])
        kpi = jax.random.uniform(jax.random.PRNGKey(13), (20, 2)) * 40 + 5
        di = jax.random.uniform(jax.random.PRNGKey(14), (20,)) * 2 + 1
        pts3d = geometry.batch_backproject_to_3d(kpi, di, K, T)
        kpi2, d2 = geometry.batch_project(pts3d, pose.invert_4x4(T), K, return_depth=True)
        np.testing.assert_allclose(np.asarray(kpi), np.asarray(kpi2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(di), np.asarray(d2), atol=1e-4)

    def test_project_to_other_img_identity(self):
        K = jnp.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]])
        T = jnp.eye(4)
        kpi = jax.random.uniform(jax.random.PRNGKey(15), (7, 2)) * 40
        di = jnp.ones(7) * 2.0
        kpj = geometry.batch_project_to_other_img(kpi, di, K, K, T)
        np.testing.assert_allclose(np.asarray(kpi), np.asarray(kpj), atol=1e-4)

    def test_bilinear_sample(self):
        img = jnp.arange(12.0).reshape(3, 4, 1)
        v = geometry.bilinear_image_sample(img, jnp.array([[1.5, 0.5]]))
        np.testing.assert_allclose(float(v[0, 0]), 3.5, atol=1e-5)

    def test_point_to_ray_distance(self):
        o = jnp.zeros((1, 3))
        d = jnp.array([[1.0, 0.0, 0.0]])
        p = jnp.array([2.0, 1.0, 0.0])
        np.testing.assert_allclose(float(geometry.point_to_ray_distance(o, d, p)[0]), 1.0, atol=1e-5)


class TestAlign:
    def _noisy_pose_set(self, key, n=4):
        gt_w2c = lie.se3_to_SE3(rand_se3(key, n, scale=0.4) + jnp.array([0, 0, 0, 0, 0, 2.0]))
        return gt_w2c

    def test_small_system_alignment_recovers_sim3(self):
        gt_w2c = self._noisy_pose_set(jax.random.PRNGKey(16))
        # apply a known sim3 in c2w space: c2w' = S @ c2w
        S = pose.pad(lie.se3_to_SE3(jnp.array([0.2, -0.1, 0.3, 0.5, 0.2, -0.4])))
        scale = 1.7
        gt_c2w = pose.pad(pose.invert(gt_w2c))
        warped_c2w = S[None] @ gt_c2w
        warped_c2w = warped_c2w.at[:, :3, 3].multiply(scale)
        warped_w2c = pose.invert(warped_c2w[:, :3])
        aligned, _ = align.prealign_w2c_small_camera_systems(warped_w2c, gt_w2c)
        err = align.evaluate_camera_alignment(aligned, gt_w2c)
        assert float(err["R"].mean()) < 0.1  # degrees; float32 compose noise
        assert float(err["t"].mean()) < 1e-2

    def test_large_system_alignment(self):
        gt_w2c = self._noisy_pose_set(jax.random.PRNGKey(17), n=8)
        S = pose.pad(lie.se3_to_SE3(jnp.array([0.1, 0.2, -0.1, 0.3, -0.5, 0.1])))
        gt_c2w = pose.pad(pose.invert(gt_w2c))
        warped_c2w = (S[None] @ gt_c2w).at[:, :3, 3].multiply(2.5)
        warped_w2c = pose.invert(warped_c2w[:, :3])
        aligned, sim3 = align.prealign_w2c_large_camera_systems(warped_w2c, gt_w2c)
        err = align.evaluate_camera_alignment(aligned, gt_w2c)
        assert float(err["t"].mean()) < 0.5  # translation x100 units

    def test_backtrack_inverts_alignment(self):
        gt_w2c = self._noisy_pose_set(jax.random.PRNGKey(18), n=5)
        S = pose.pad(lie.se3_to_SE3(jnp.array([0.15, 0.0, -0.2, 0.1, 0.4, -0.3])))
        gt_c2w = pose.pad(pose.invert(gt_w2c))
        warped_c2w = (S[None] @ gt_c2w).at[:, :3, 3].multiply(1.3)
        warped_w2c = pose.invert(warped_c2w[:, :3])
        _, sim3 = align.prealign_w2c_small_camera_systems(warped_w2c, gt_w2c)
        # mapping GT back through the sim3 should land on the warped (optimized) poses
        backtracked = align.backtrack_from_aligning_the_trajectory(gt_w2c, sim3)
        np.testing.assert_allclose(np.asarray(backtracked), np.asarray(warped_w2c), atol=1e-3)

    def test_procrustes(self):
        X0 = jax.random.normal(jax.random.PRNGKey(19), (30, 3))
        R = lie.so3_to_SO3(jnp.array([0.2, -0.3, 0.4]))
        X1 = (X0 * 2.0) @ R.T + jnp.array([1.0, -2.0, 0.5])
        sim3 = align.procrustes_analysis(X0, X1)
        X1to0 = (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
        np.testing.assert_allclose(np.asarray(X1to0), np.asarray(X0), atol=1e-3)


class TestHostF64Pose:
    """Host-float64 mirrors used by the metric paths (core/align.py)."""

    def test_se3_exp_matches_device(self):
        wu = np.asarray(rand_se3(jax.random.PRNGKey(40), 6, scale=0.8))
        host = align.se3_to_SE3_host(wu)
        dev = np.asarray(lie.se3_to_SE3(jnp.asarray(wu)))
        np.testing.assert_allclose(host, dev, atol=3e-6)

    def test_se3_exp_small_angle(self):
        wu = np.zeros((2, 6))
        wu[1] = 1e-12  # below the series switch
        host = align.se3_to_SE3_host(wu)
        np.testing.assert_allclose(host[0, :, :3], np.eye(3), atol=1e-15)
        assert np.all(np.isfinite(host))

    def test_compose_pair_matches_device(self):
        a = np.asarray(lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(41), 4, scale=0.5)))
        b = np.asarray(lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(42), 4, scale=0.5)))
        host = align.compose_pair_host(a, b)
        dev = np.asarray(pose.compose_pair(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(host, dev, atol=1e-5)

    def test_current_pose_pnp_host_matches_device(self):
        from poseprobe_tpu.models import pose_refine

        se3 = np.asarray(rand_se3(jax.random.PRNGKey(43), 5, scale=0.1))
        base = np.asarray(lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(44), 5, scale=0.5)))
        host = align.current_pose_pnp_host(se3, base, fix_first=True)
        dev = np.asarray(pose_refine.current_pose_pnp(
            {"se3_refine": jnp.asarray(se3)}, jnp.asarray(base), fix_first=True))
        np.testing.assert_allclose(host, dev, atol=1e-5)
        # the gauge anchor must be byte-identical to the base pose
        np.testing.assert_array_equal(host[0], np.asarray(base[0], dtype=np.float64))

    def test_rotation_metric_exact_near_zero(self):
        """The asin-form R metric resolves angles the acos form clips to 0."""
        gt = np.asarray(lie.se3_to_SE3(rand_se3(jax.random.PRNGKey(45), 3, scale=0.4)))
        gt64 = align.current_pose_pnp_host(np.zeros((3, 6)), gt, fix_first=False)
        for theta_deg in (1e-5, 1e-3, 0.5, 10.0):
            theta = np.radians(theta_deg)
            d = np.zeros((3, 6))
            d[:, 0] = theta  # rotate about x
            perturbed = align.compose_pair_host(align.se3_to_SE3_host(d), gt64)
            err = align.evaluate_camera_alignment(perturbed, gt64)
            np.testing.assert_allclose(err["R"], theta_deg, rtol=1e-4)
