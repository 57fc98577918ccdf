"""Model-level tests: object SDF renderer, surface query, scene NeRF, pose refine."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseprobe_tpu.core import lie, pose, rays
from poseprobe_tpu.models import deform, object_sdf, pose_refine, scene_nerf


TINY = object_sdf.ObjectConfig(
    xyz_min=(-1.0, -1.0, -1.0), xyz_max=(1.0, 1.0, 1.0),
    num_voxels=32**3, num_voxels_base=32**3, N_iters=100,
    world_bound_scale=1.5, barf_c2f=None,
)


def front_camera(n=1, dist=3.0, H=16, W=16, f=16.0):
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    c2w = pose.make(R=jnp.eye(3), t=jnp.array([0.0, 0.0, -dist]))
    ro, rd = rays.get_rays(H, W, K, c2w, inverse_y=True)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


class TestObjectModel:
    def setup_method(self):
        self.params = object_sdf.init_object_params(jax.random.PRNGKey(0), TINY)

    def test_cube_init_sign(self):
        sdf = np.asarray(self.params["sdf_grid"])[0]
        n = sdf.shape[0]
        assert sdf[n // 2, n // 2, n // 2] < 0  # inside the probe cube
        assert sdf[0, 0, 0] > 0  # corner outside

    def test_render_shapes_and_finite(self):
        ro, rd, vd = front_camera()
        out = object_sdf.render(self.params, TINY, ro, rd, vd, global_step=0,
                                rng=jax.random.PRNGKey(1), near=0.3, far=9.0)
        N = ro.shape[0]
        assert out["rgb_marched"].shape == (N, 3)
        assert out["cum_weights"].shape == (N, 1)
        assert out["weights"].shape[0] == N
        for k in ["rgb_marched", "depth", "gradient", "sdf_deform", "grad_deform", "sdf_correct"]:
            assert np.all(np.isfinite(np.asarray(out[k]))), k

    def test_render_cube_silhouette(self):
        # center ray hits the probe cube -> opacity ~1; border ray misses
        ro, rd, vd = front_camera(H=9, W=9, f=9.0)
        out = object_sdf.render(self.params, TINY, ro, rd, vd, global_step=100,
                                rng=None, near=0.3, far=9.0)
        op = np.asarray(out["cum_weights"]).reshape(9, 9)
        assert op[4, 4] > 0.8
        assert op[0, 0] < 0.2

    def test_surface_query_on_cube(self):
        # probe cube half-size = 2/(1.5*1.05)/2 ~ 0.635; front face at z=-0.635
        ro, rd, vd = front_camera(H=5, W=5, f=25.0)  # narrow fov, all rays hit
        pts, valid, _ = object_sdf.query_surface_points(self.params, TINY, ro, rd,
                                                        near=0.3, far=9.0)
        half = float(TINY.rect_size[2]) / 2
        v = np.asarray(valid)
        assert v.all()
        z = np.asarray(pts)[:, 2]
        np.testing.assert_allclose(z, -half, atol=0.15)

    def test_surface_query_render_variant(self):
        ro, rd, vd = front_camera(H=5, W=5, f=25.0)
        pts, valid, depth = object_sdf.query_surface_points_render(
            self.params, TINY, ro, rd, global_step=100, near=0.3, far=9.0)
        assert np.asarray(valid).all()
        half = float(TINY.rect_size[2]) / 2
        np.testing.assert_allclose(np.asarray(pts)[:, 2], -half, atol=0.2)

    def test_grads_flow_to_all_params(self):
        ro, rd, vd = front_camera(H=4, W=4)

        def loss_fn(params):
            out = object_sdf.render(params, TINY, ro, rd, vd, global_step=50,
                                    rng=None, near=0.3, far=9.0)
            return (out["rgb_marched"].sum() + out["depth"].sum()
                    + jnp.abs(out["gradient"]).sum() * 1e-3)

        g = jax.grad(loss_fn)(self.params)
        assert float(jnp.abs(g["sdf_grid"]).sum()) > 0
        assert float(jnp.abs(g["k0_grid"]).sum()) > 0
        assert float(jnp.abs(g["rgbnet"][0]["w"]).sum()) > 0
        assert float(jnp.abs(g["sdf_alpha"])) > 0
        # warpnet last layer is zero-init but must still receive gradient
        assert float(jnp.abs(g["warpnet"]["layers"][-1]["w"]).sum()) > 0

    def test_eikonal_near_surface(self):
        # spatial SDF gradient of the mapped grid is nonzero near the surface
        ro, rd, vd = front_camera(H=4, W=4, f=20.0)
        out = object_sdf.render(self.params, TINY, ro, rd, vd, global_step=100,
                                rng=None, near=0.3, far=9.0)
        gnorm = np.asarray(jnp.linalg.norm(out["gradient"], axis=-1))
        w = np.asarray(out["weights"])
        assert gnorm[w > 0.01].mean() > 0.05

    def test_maskout_near_cam(self):
        p2 = object_sdf.maskout_near_cam_vox(self.params, TINY, np.array([[0, 0, -1.0]]), near=0.5)
        sdf = np.asarray(p2["sdf_grid"])[0]
        # voxel nearest the camera is forced empty
        assert sdf[16, 16, 0] == 1.0

    def test_extract_sdf_volume(self):
        vol = object_sdf.extract_sdf_volume(self.params, TINY, resolution=24, use_deform=True)
        assert vol.shape == (24, 24, 24)
        assert vol[12, 12, 12] > 0  # -sdf > 0 inside

    def test_shell_positivity_prior(self):
        from poseprobe_tpu.losses.object import shell_positivity_loss

        # inactive on healthy geometry: cube init is positive at the shell
        healthy = float(shell_positivity_loss(self.params["sdf_grid"]))
        assert healthy == 0.0
        # active in the filled-box basin (raw grid negative to the bbox faces)
        filled = -jnp.abs(self.params["sdf_grid"])
        loss, grad = jax.value_and_grad(
            lambda g: shell_positivity_loss(g, margin=0.1))(filled)
        assert float(loss) > 0.0
        g = np.asarray(grad)[0]
        # gradient pushes the shell voxels positive (descent = -grad > 0)...
        assert g[0].max() < 0 and g[-1].max() < 0
        assert g[:, 0].max() < 0 and g[:, :, -1].max() < 0
        # ...and leaves the interior untouched
        assert np.all(g[1:-1, 1:-1, 1:-1] == 0.0)


class TestDeform:
    def test_zero_init_identity(self):
        p = deform.init_deform_params(jax.random.PRNGKey(0), output_range=1.3)
        pts = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
        d, c = deform.apply_deform(p, pts)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-7)

    def test_jacobian_identity_at_init(self):
        p = deform.init_deform_params(jax.random.PRNGKey(0), output_range=1.0)
        pts = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        _, _, jac = deform.deform_with_jacobian(p, pts)
        np.testing.assert_allclose(np.asarray(jac), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-6)

    def test_jacobian_matches_jacfwd(self):
        p = deform.init_deform_params(jax.random.PRNGKey(2), output_range=1.0)
        # perturb last layer so the field is non-trivial
        p["layers"][-1]["w"] = jax.random.normal(jax.random.PRNGKey(3), p["layers"][-1]["w"].shape) * 0.1
        pts = jax.random.normal(jax.random.PRNGKey(4), (3, 3))

        def warped(q):
            d, _ = deform.apply_deform(p, q)
            return q + d

        jac_ref = jax.vmap(jax.jacfwd(lambda q: warped(q[None])[0]))(pts)  # [N, 3out, 3in]
        _, _, jac = deform.deform_with_jacobian(p, pts)  # [N, 3in, 3out]
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jnp.swapaxes(jac_ref, -1, -2)), atol=1e-5)

    def test_fused_jacobian_fwd_matches_jacfwd(self):
        """deform_with_jacobian_fwd (shared-mask tangent propagation) against
        plain jacfwd of apply_deform, incl. the outer backward (the renderer
        differentiates through jac_warp for the grad_deform prior)."""
        p = deform.init_deform_params(jax.random.PRNGKey(2), output_range=1.3)
        for li in range(len(p["layers"])):
            p["layers"][li]["w"] = p["layers"][li]["w"] + jax.random.normal(
                jax.random.PRNGKey(10 + li), p["layers"][li]["w"].shape) * 0.05
        pts = jax.random.normal(jax.random.PRNGKey(4), (7, 3))

        def full(q):
            d, c = deform.apply_deform(p, q)
            return jnp.concatenate([d, c], -1)

        jac_ref = jax.vmap(jax.jacfwd(lambda q: full(q[None])[0]))(pts)  # [N, 4out, 3in]
        d, c, jw, gc = deform.deform_with_jacobian_fwd(p, pts)
        d_ref, c_ref = deform.apply_deform(p, pts)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-5)
        jw_ref = jnp.swapaxes(jac_ref[:, :3, :], -1, -2) + jnp.eye(3)
        np.testing.assert_allclose(np.asarray(jw), np.asarray(jw_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(jac_ref[:, 3, :]), atol=1e-5)

        # outer VJP parity: grad of a jac_warp-dependent scalar w.r.t. params
        def loss_fused(params):
            _, _, jw, gc = deform.deform_with_jacobian_fwd(params, pts)
            return (jw ** 2).sum() + (gc ** 2).sum()

        def loss_ref(params):
            def full_p(q):
                d, c = deform.apply_deform(params, q)
                return jnp.concatenate([d, c], -1)
            jac = jax.vmap(jax.jacfwd(lambda q: full_p(q[None])[0]))(pts)
            jw = jnp.swapaxes(jac[:, :3, :], -1, -2) + jnp.eye(3)
            return (jw ** 2).sum() + (jac[:, 3, :] ** 2).sum()

        g1 = jax.grad(loss_fused)(p)
        g2 = jax.grad(loss_ref)(p)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestSceneNeRF:
    CFG = scene_nerf.SceneConfig(layers_feat=(32,) * 5, layers_rgb=(16, 3), skip=(2,),
                                 L_3D=4, L_view=2, sample_intvs=24, sample_intvs_fine=24,
                                 barf_c2f=None)

    def _rays(self, B=1, R=32):
        key = jax.random.PRNGKey(0)
        center = jax.random.normal(key, (B, R, 3)) * 0.1 + jnp.array([0, 0, -3.0])
        ray = jnp.tile(jnp.array([[[0.0, 0.0, 1.0]]]), (B, R, 1))
        return center, ray

    def test_render_shapes(self):
        params = scene_nerf.init_scene_params(jax.random.PRNGKey(1), self.CFG)
        center, ray = self._rays()
        out = scene_nerf.render_rays(params, self.CFG, center, ray, (1.0, 5.0),
                                     progress=1.0, rng=jax.random.PRNGKey(2), compute_fine=True)
        assert out["rgb"].shape == (1, 32, 3)
        assert out["depth"].shape == (1, 32, 1)
        assert out["rgb_fine"].shape == (1, 32, 3)
        assert out["t_fine"].shape[2] == 48  # coarse + fine sorted together
        assert np.all(np.isfinite(np.asarray(out["rgb"])))

    def test_overfit_constant_color(self):
        # few Adam steps should drive rgb toward a constant target
        import optax
        cfg = dataclasses.replace(self.CFG, fine_sampling=False)
        params = scene_nerf.init_scene_params(jax.random.PRNGKey(3), cfg)
        center, ray = self._rays(R=64)
        target = jnp.ones((1, 64, 3)) * jnp.array([0.8, 0.2, 0.5])
        opt = optax.adam(5e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state, rng):
            def loss_fn(p):
                out = scene_nerf.render_rays(p, cfg, center, ray, (1.0, 5.0), 1.0, rng, False)
                return ((out["rgb"] - target) ** 2).mean()
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, state = opt.update(g, state)
            return optax.apply_updates(params, up), state, loss

        losses = []
        for i in range(60):
            params, state, loss = step(params, state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5

    def test_render_to_max_visibility(self):
        params = scene_nerf.init_scene_params(jax.random.PRNGKey(4), self.CFG)
        center, ray = self._rays()
        depth_max = jnp.full((1, 32), 2.0)
        out = scene_nerf.render_rays_to_max(params, self.CFG, center, ray, 0.5,
                                            depth_max, progress=1.0, compute_fine=False)
        vis = np.asarray(out["all_cumulated"])
        assert vis.shape == (1, 32)
        assert (vis >= 0).all() and (vis <= 1 + 1e-5).all()


class TestPoseRefine:
    def test_first_pose_fixed(self):
        pp = pose_refine.init_pose_params(3)
        pp["se3_refine"] = jnp.ones((3, 6)) * 0.1
        pnp_poses = lie.se3_to_SE3(jax.random.normal(jax.random.PRNGKey(0), (3, 6)) * 0.3)
        cur = pose_refine.current_pose_pnp(pp, pnp_poses)
        np.testing.assert_allclose(np.asarray(cur[0]), np.asarray(pnp_poses[0]), atol=1e-7)
        assert not np.allclose(np.asarray(cur[1]), np.asarray(pnp_poses[1]))

    def test_refine_composition_order(self):
        # current(x) = pnp(refine(x)): with refine = pure translation u, points
        # shift by R_pnp @ u in camera space
        pp = pose_refine.init_pose_params(2)
        u = jnp.array([0.1, -0.2, 0.3])
        pp["se3_refine"] = jnp.stack([jnp.zeros(6), jnp.concatenate([jnp.zeros(3), u])])
        pnp_poses = lie.se3_to_SE3(jax.random.normal(jax.random.PRNGKey(1), (2, 6)) * 0.3)
        cur = pose_refine.current_pose_pnp(pp, pnp_poses)
        X = jnp.zeros((1, 3))
        got = pose.world2cam(X[None], cur[1:2])[0]
        expected = pose.world2cam((X + u)[None], pnp_poses[1:2])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    def test_noise_reproducible(self):
        n1 = pose_refine.make_pose_noise(jax.random.PRNGKey(5), 4, 0.15)
        n2 = pose_refine.make_pose_noise(jax.random.PRNGKey(5), 4, 0.15)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2))


class TestSceneViewSplitParity:
    def test_rgb_head_split_matches_concat_formulation(self):
        # the per-ray view-PE push-through must equal the naive
        # concat([feat, ray_enc]) @ W formulation
        import jax
        import jax.numpy as jnp
        from poseprobe_tpu.ops import pe as pe_mod

        cfg = scene_nerf.SceneConfig(layers_feat=(32,) * 3, layers_rgb=(16, 3), skip=(1,),
                                     L_3D=4, L_view=2, barf_c2f=None)
        params = scene_nerf.init_scene_params(jax.random.PRNGKey(0), cfg)
        pts = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 12, 3))
        ray = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 3))
        out = scene_nerf.nerf_forward(params["nerf"], cfg, pts, ray, 1.0)

        # naive reference formulation
        enc = pe_mod.posenc_scene(pts, cfg.L_3D, 1.0, None)
        feat = enc
        for li, layer in enumerate(params["nerf"]["feat"]):
            if li in cfg.skip:
                feat = jnp.concatenate([feat, enc], axis=-1)
            feat = feat @ layer["w"] + layer["b"]
            if li == len(params["nerf"]["feat"]) - 1:
                feat = feat[..., 1:]
            feat = jax.nn.relu(feat)
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        ray_enc = pe_mod.posenc_scene(
            jnp.broadcast_to(ray_unit[..., None, :], pts.shape), cfg.L_view, 1.0, None)
        x = jnp.concatenate([feat, ray_enc], -1)
        for li, layer in enumerate(params["nerf"]["rgb"]):
            x = x @ layer["w"] + layer["b"]
            if li != len(params["nerf"]["rgb"]) - 1:
                x = jax.nn.relu(x)
        rgb_ref = jax.nn.sigmoid(x)
        np.testing.assert_allclose(np.asarray(out["rgb_samples"]), np.asarray(rgb_ref),
                                   atol=2e-5)


class TestMixedPrecisionSceneMLP:
    def test_bf16_matmuls_close_to_f32(self):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from poseprobe_tpu.models import scene_nerf

        cfg32 = scene_nerf.SceneConfig(layers_feat=(64,) * 4, layers_rgb=(32, 3),
                                       skip=(2,), L_3D=6, L_view=2,
                                       sample_intvs=16, sample_intvs_fine=16,
                                       rand_rays=32, fine_sampling=False,
                                       barf_c2f=None, matmul_dtype="float32")
        cfg16 = dataclasses.replace(cfg32, matmul_dtype="bfloat16")
        params = scene_nerf.init_scene_params(jax.random.PRNGKey(0), cfg32)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 16, 3), minval=-1, maxval=1)
        ray = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 3))
        o32 = scene_nerf.nerf_forward(params["nerf"], cfg32, pts, ray, 1.0)
        o16 = scene_nerf.nerf_forward(params["nerf"], cfg16, pts, ray, 1.0)
        # outputs are f32 in both cases; values agree to bf16 operand precision
        assert o16["rgb_samples"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(o16["rgb_samples"]),
                                   np.asarray(o32["rgb_samples"]), atol=3e-2)
        np.testing.assert_allclose(np.asarray(o16["density_samples"]),
                                   np.asarray(o32["density_samples"]),
                                   atol=5e-2, rtol=5e-2)
        # gradients flow and stay finite through the casts
        g = jax.grad(lambda p: scene_nerf.nerf_forward(p, cfg16, pts, ray, 1.0)[
            "rgb_samples"].sum())(params["nerf"])
        assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


class TestBatchedRenderEquivalence:
    def test_concatenated_rays_render_identically(self):
        """The trainer batches main + corres rays into ONE render_rays call;
        per-ray independence means the concatenated render must equal the
        separate renders (deterministic path: rng=None)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from poseprobe_tpu.models import scene_nerf

        cfg = scene_nerf.SceneConfig(layers_feat=(32,) * 4, layers_rgb=(16, 3),
                                     skip=(2,), L_3D=4, L_view=2,
                                     sample_intvs=12, sample_intvs_fine=12,
                                     rand_rays=24, fine_sampling=True,
                                     barf_c2f=None)
        params = scene_nerf.init_scene_params(jax.random.PRNGKey(0), cfg)
        kc, kr = jax.random.split(jax.random.PRNGKey(1))
        center = jax.random.normal(kc, (1, 24, 3)) * 0.1
        ray = jax.random.normal(kr, (1, 24, 3))
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

        full = scene_nerf.render_rays(params, cfg, center, ray, (0.5, 4.0),
                                      progress=1.0, rng=None, compute_fine=True,
                                      mode_train=False)
        part_a = scene_nerf.render_rays(params, cfg, center[:, :10], ray[:, :10],
                                        (0.5, 4.0), progress=1.0, rng=None,
                                        compute_fine=True, mode_train=False)
        part_b = scene_nerf.render_rays(params, cfg, center[:, 10:], ray[:, 10:],
                                        (0.5, 4.0), progress=1.0, rng=None,
                                        compute_fine=True, mode_train=False)
        for k in ("rgb", "depth", "rgb_fine", "depth_fine", "opacity_fine"):
            got = np.asarray(full[k])
            want = np.concatenate([np.asarray(part_a[k]), np.asarray(part_b[k])], axis=1)
            np.testing.assert_allclose(got, want, atol=1e-5, err_msg=k)


class TestPnPHoldout:
    """pnp._holdout_reproj: cross-validated reprojection quality."""

    def _project(self, pose, X, K):
        Xc = X @ pose[:, :3].T + pose[:, 3]
        uv = Xc @ K.T
        return uv[:, :2] / uv[:, 2:3]

    def test_well_constrained_vs_degenerate(self):
        from poseprobe_tpu.core import lie
        from poseprobe_tpu.pose_init import pnp

        rng = np.random.default_rng(0)
        K = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1.0]])
        pose_gt = np.asarray(lie.se3_to_SE3(
            jnp.asarray([[0.1, -0.05, 0.02, 0.03, 0.01, 0.9]])))[0]
        prev = np.asarray(lie.se3_to_SE3(
            jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, 1.0]])))[0]

        # well-constrained: wide 3D spread in front of the camera
        X = rng.uniform(-0.8, 0.8, (60, 3)); X[:, 2] += 3.0
        uv = self._project(pose_gt, X, K) + rng.normal(0, 0.3, (60, 2))
        good = pnp._holdout_reproj(X, uv, K, prev)

        # degenerate: planar tight cluster (shallow spread, pixel noise on
        # the order of the image-space spread) — the pose is weakly
        # constrained, so each half-solve overfits its own noise
        Xd = rng.uniform(-0.05, 0.05, (60, 3))
        Xd[:, 2] = 3.0
        uvd = self._project(pose_gt, Xd, K) + rng.normal(0, 1.0, (60, 2))
        bad = pnp._holdout_reproj(Xd, uvd, K, prev)

        assert np.isfinite(good) and good < 2.0
        assert bad > 2.0 * good  # degeneracy shows up in cross-validation

    def test_quality_dict_carries_holdout(self):
        from poseprobe_tpu.core import lie
        from poseprobe_tpu.pose_init import pnp

        rng = np.random.default_rng(1)
        K = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1.0]])
        pose_gt = np.asarray(lie.se3_to_SE3(
            jnp.asarray([[0.05, 0.02, -0.01, 0.02, -0.03, 0.8]])))[0]
        X = rng.uniform(-0.8, 0.8, (50, 3)); X[:, 2] += 3.0
        uv = self._project(pose_gt, X, K)
        prev = np.asarray(lie.se3_to_SE3(
            jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, 1.0]])))[0]
        pnp.solve_pnp(X, uv, K, prev)
        q = pnp.LAST_QUALITY
        assert "holdout_reproj_px" in q and np.isfinite(q["holdout_reproj_px"])

    def test_too_few_points_distrusted(self):
        from poseprobe_tpu.pose_init import pnp

        K = np.eye(3)
        assert pnp._holdout_reproj(np.zeros((8, 3)), np.zeros((8, 2)), K,
                                   np.eye(3)[:3]) == float("inf")
