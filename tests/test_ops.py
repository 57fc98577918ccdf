"""Tests for grid sampling, ray sampling, compositing, and positional encoding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseprobe_tpu.ops import compositing, grid as grid_ops, pe, ray_sampling


class TestTrilinear:
    def test_matches_torch_grid_sample(self):
        # parity with the reference's F.grid_sample(..., align_corners=True,
        # padding_mode='border') incl. the axis flip in grid_sampler
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        g = rng.standard_normal((4, 5, 6, 7)).astype(np.float32)  # [C, X, Y, Z]
        xyz_min = np.array([-1.0, -2.0, 0.0], np.float32)
        xyz_max = np.array([1.0, 0.0, 3.0], np.float32)
        pts = rng.uniform(-0.2, 1.2, size=(50, 3)).astype(np.float32)
        pts = xyz_min + pts * (xyz_max - xyz_min)  # includes out-of-range

        ours = np.asarray(grid_ops.trilinear_sample(jnp.array(g), jnp.array(pts), jnp.array(xyz_min), jnp.array(xyz_max)))

        ind_norm = (pts - xyz_min) / (xyz_max - xyz_min)
        ind_norm = ind_norm[..., ::-1] * 2 - 1  # flip to (z, y, x) like reference
        t_grid = torch.from_numpy(g[None])  # [1, C, X, Y, Z]
        t_pts = torch.from_numpy(np.ascontiguousarray(ind_norm)).reshape(1, 1, 1, -1, 3)
        ref = torch.nn.functional.grid_sample(
            t_grid, t_pts, mode="bilinear", align_corners=True, padding_mode="border"
        ).reshape(4, -1).T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_arbitrary_order_differentiable(self):
        # the reason the reference needed a custom grid_sample_3d is double-backward;
        # here grad-of-grad must just work
        g = jnp.arange(27.0).reshape(1, 3, 3, 3)
        lo, hi = jnp.zeros(3), jnp.ones(3) * 2

        def f(p):
            return grid_ops.trilinear_sample(g, p, lo, hi).sum()

        p = jnp.array([[0.5, 0.7, 1.2]])
        g1 = jax.grad(f)(p)
        g2 = jax.jacfwd(jax.grad(f))(p)
        assert np.all(np.isfinite(np.asarray(g1)))
        assert np.all(np.isfinite(np.asarray(g2)))

    def test_resize_identity_on_linear_field(self):
        # trilinear resize reproduces a linear field exactly
        x = jnp.linspace(0, 1, 4)
        field = (x[:, None, None] + 2 * x[None, :, None] + 3 * x[None, None, :])[None]
        up = grid_ops.resize_trilinear(field, (7, 7, 7))
        xx = jnp.linspace(0, 1, 7)
        expected = (xx[:, None, None] + 2 * xx[None, :, None] + 3 * xx[None, None, :])[None]
        np.testing.assert_allclose(np.asarray(up), np.asarray(expected), atol=1e-5)

    def test_total_variation_golden(self):
        v = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, 0].set(1.0)
        # neighbors of the 1-voxel: 3 diffs of 1 => (1+1+1)/3/8
        np.testing.assert_allclose(float(grid_ops.total_variation(v)), 3 / 3 / 8, atol=1e-6)

    def test_sdf_gradient_on_linear_sdf(self):
        x = jnp.linspace(0, 3, 4)
        sdf = jnp.broadcast_to(x[:, None, None], (4, 4, 4))[None]
        g = grid_ops.sdf_gradient_grid(sdf, voxel_size=jnp.array(1.0))
        np.testing.assert_allclose(np.asarray(g[0, 1:-1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-6)


class TestRaySampling:
    def test_aabb_analytic(self):
        o = jnp.array([[-2.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        lo, hi = -jnp.ones(3), jnp.ones(3)
        t_min, t_max, miss = ray_sampling.ray_aabb(o, d, lo, hi, near=0.0, far=10.0)
        np.testing.assert_allclose(float(t_min[0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(t_max[0]), 3.0, atol=1e-6)
        assert not bool(miss[0])

    def test_miss_detection(self):
        o = jnp.array([[-2.0, 5.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        lo, hi = -jnp.ones(3), jnp.ones(3)
        _, _, miss = ray_sampling.ray_aabb(o, d, lo, hi, near=0.0, far=10.0)
        assert bool(miss[0])

    def test_sample_points_inside_box(self):
        key = jax.random.PRNGKey(0)
        o = jax.random.normal(key, (16, 3)) * 0.1 + jnp.array([0, 0, -3.0])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
        lo, hi = -jnp.ones(3), jnp.ones(3)
        out = ray_sampling.sample_ray(o, d, lo, hi, near=0.1, far=10.0, stepsize=0.5,
                                      voxel_size=jnp.array(0.25), n_samples=24)
        pts_in = np.asarray(out.pts)[np.asarray(out.mask_inbbox)]
        assert pts_in.shape[0] > 0
        assert (pts_in >= -1 - 1e-5).all() and (pts_in <= 1 + 1e-5).all()

    def test_pdf_resampling_concentrates(self):
        # all weight in one bin -> fine samples land in that bin
        weights = jnp.zeros((1, 1, 8)).at[0, 0, 3].set(1.0)
        d = ray_sampling.sample_depth_from_pdf(None, weights, 8, 16, 0.0, 8.0)
        assert float(d.min()) >= 3.0 - 1e-4 and float(d.max()) <= 4.0 + 1e-4

    def test_stratified_depth_range(self):
        d = ray_sampling.sample_depth_stratified(jax.random.PRNGKey(1), 2, 10, 32, 1.0, 5.0)
        assert d.shape == (2, 10, 32, 1)
        assert float(d.min()) >= 1.0 and float(d.max()) <= 5.0


class TestCompositing:
    def test_alpha2weights_matches_reference_recurrence(self):
        # golden check vs the sequential CUDA semantics (render_utils_kernel.cu:577-604)
        alpha = np.array([0.1, 0.5, 0.9, 0.3], np.float32)
        T, w_ref = 1.0, []
        for a in alpha:
            w_ref.append(T * a)
            T = T * (1 - a)
        w, ainv = compositing.alpha2weights(jnp.array(alpha)[None], early_termination=False)
        np.testing.assert_allclose(np.asarray(w[0]), w_ref, atol=1e-6)
        np.testing.assert_allclose(float(ainv[0]), T, atol=1e-6)

    def test_alpha2weights_early_termination(self):
        alpha = jnp.array([[0.99, 0.99, 0.99, 0.5]])
        w, _ = compositing.alpha2weights(alpha, early_termination=True)
        # T after 3 samples = 1e-6 < 1e-3 -> 4th weight zeroed
        assert float(w[0, 3]) == 0.0

    def test_alpha2weights_grad_matches_autodiff_of_cumprod(self):
        alpha = jnp.array([[0.1, 0.4, 0.2, 0.6]])

        def loss(a):
            w, ainv = compositing.alpha2weights(a, early_termination=False)
            return (w * jnp.arange(4.0)).sum() + 2.0 * ainv.sum()

        g = jax.grad(loss)(alpha)
        # finite differences
        eps = 1e-3
        g_fd = np.zeros(4)
        for i in range(4):
            ap = alpha.at[0, i].add(eps)
            am = alpha.at[0, i].add(-eps)
            g_fd[i] = (float(loss(ap)) - float(loss(am))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[0]), g_fd, atol=1e-3)

    def test_neus_alpha_zero_crossing(self):
        # sdf going + -> - along the ray yields high alpha at the crossing
        sdf = jnp.linspace(0.5, -0.5, 11)
        grad = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (11, 1))  # surface normal against ray
        view = jnp.array([0.0, 0.0, 1.0])
        alpha = compositing.neus_alpha_from_sdf(view, 0.1, sdf, grad, s_val=0.05)
        assert float(alpha.max()) > 0.1
        w, _ = compositing.alpha2weights(alpha[None])
        peak = int(np.asarray(w[0]).argmax())
        assert 3 <= peak <= 7  # weight peaks near the crossing

    def test_nerf_composite_opaque_wall(self):
        # huge density at one depth -> depth estimate = that depth, opacity 1
        B, R, N = 1, 2, 64
        depth = jnp.broadcast_to(jnp.linspace(0.5, 4.0, N)[None, None, :, None], (B, R, N, 1))
        density = jnp.zeros((B, R, N)).at[:, :, 30].set(1e5)
        rgb = jnp.ones((B, R, N, 3)) * 0.7
        ray = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (B, R, 1))
        out = compositing.nerf_composite(rgb, density, depth, ray)
        np.testing.assert_allclose(np.asarray(out.opacity), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.depth[..., 0]), float(depth[0, 0, 30, 0]), atol=0.1)
        np.testing.assert_allclose(np.asarray(out.rgb), 0.7, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.all_cumulated), 0.0, atol=1e-5)

    def test_s_val_schedule(self):
        # matches 1/(step + s_ratio/s_start) * s_ratio (voxurf_coarse.py:487)
        s0 = compositing.s_val_schedule(0, s_ratio=50.0, s_start=0.2)
        np.testing.assert_allclose(float(s0), 0.2, atol=1e-6)
        s_late = compositing.s_val_schedule(10000, s_ratio=50.0, s_start=0.2)
        assert float(s_late) < 0.01


class TestPE:
    def test_barf_weights_endpoints(self):
        w0 = pe.barf_weights(0.0, 4, (0.4, 0.7))
        w1 = pe.barf_weights(1.0, 4, (0.4, 0.7))
        np.testing.assert_allclose(np.asarray(w0), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w1), 1.0, atol=1e-6)

    def test_barf_weights_monotone(self):
        ws = [np.asarray(pe.barf_weights(p, 6, (0.2, 0.8))).sum() for p in np.linspace(0, 1, 9)]
        assert all(b >= a - 1e-6 for a, b in zip(ws, ws[1:]))

    def test_posenc_shapes(self):
        x = jnp.ones((5, 3))
        enc_obj = pe.posenc_object(x, L=5, progress=1.0, barf_c2f=None)
        assert enc_obj.shape == (5, 3 + 2 * 3 * 5)
        enc_scene = pe.posenc_scene(x, L=10, progress=1.0, barf_c2f=None)
        assert enc_scene.shape == (5, 3 + 2 * 3 * 10)

    def test_posenc_scene_matches_reference_layout(self):
        # FrequencyEmbedder: stack([sin, cos], dim=-2) over [..., N, L] then flatten
        x = jnp.array([[0.3, -0.2, 0.9]])
        L = 4
        enc = pe.posenc_scene(x, L=L, progress=1.0, barf_c2f=None, add_raw=False)
        freq = 2.0 ** np.arange(L) * np.pi
        spec = np.asarray(x)[..., None] * freq  # [1, 3, L]
        ref = np.stack([np.sin(spec), np.cos(spec)], axis=-2).reshape(1, -1)
        np.testing.assert_allclose(np.asarray(enc), ref, atol=1e-5)


class TestFinePassSortFreePaths:
    """Round-2 TPU optimizations must stay exact: vectorized inverse-CDF
    ranks == searchsorted semantics, and the rank merge == jnp.sort."""

    def test_merge_sorted_depths_equals_sort(self):
        rng = np.random.RandomState(0)
        a = np.sort(rng.rand(2, 5, 16, 1), axis=2).astype(np.float32)
        b = np.sort(rng.rand(2, 5, 8, 1), axis=2).astype(np.float32)
        got = np.asarray(ray_sampling.merge_sorted_depths(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(got, np.sort(np.concatenate([a, b], axis=2), axis=2))

    def test_merge_sorted_depths_with_ties(self):
        rng = np.random.RandomState(1)
        a = np.sort(np.round(rng.rand(1, 3, 10, 1) * 4) / 4, axis=2).astype(np.float32)
        b = np.sort(np.round(rng.rand(1, 3, 6, 1) * 4) / 4, axis=2).astype(np.float32)
        got = np.asarray(ray_sampling.merge_sorted_depths(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(got, np.sort(np.concatenate([a, b], axis=2), axis=2))

    def test_pdf_resample_sorted_and_in_range(self):
        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.rand(2, 4, 16).astype(np.float32))
        d = ray_sampling.sample_depth_from_pdf(jax.random.PRNGKey(0), w, 16, 12, 0.5, 6.0)
        dd = np.asarray(d)[..., 0]
        assert (np.diff(dd, axis=-1) >= -1e-6).all(), "fine depths must be per-ray ascending"
        assert dd.min() >= 0.5 and dd.max() <= 6.0

    def test_pdf_resample_rank_matches_searchsorted(self):
        """The broadcast compare+reduce must equal searchsorted(side='right')."""
        rng = np.random.RandomState(3)
        pdf = rng.rand(3, 8).astype(np.float32)
        cdf = np.concatenate([np.zeros((3, 1), np.float32),
                              np.cumsum(pdf / pdf.sum(-1, keepdims=True), -1)], -1)
        unif = rng.rand(3, 5).astype(np.float32)
        want = np.stack([np.searchsorted(c, u, side="right") for c, u in zip(cdf, unif)])
        got = np.asarray((jnp.asarray(cdf)[..., :, None]
                          <= jnp.asarray(unif)[..., None, :]).sum(axis=-2))
        np.testing.assert_array_equal(got, want)

    def test_pdf_resample_matches_gather_formulation(self):
        """The gather-free interpolation (linspace arithmetic + masked max/min
        CDF endpoints) must equal the original take_along_axis formulation."""
        rng = np.random.RandomState(7)
        Sc, Sf = 16, 12
        w = jnp.asarray(rng.rand(2, 5, Sc).astype(np.float32))
        dmin, dmax = 0.5, 6.0
        got = np.asarray(ray_sampling.sample_depth_from_pdf(
            jax.random.PRNGKey(4), w, Sc, Sf, dmin, dmax))[..., 0]

        # reference: the pre-optimization gather-based version
        pdf = np.asarray(w) / (np.asarray(w).sum(-1, keepdims=True) + 1e-6)
        cdf = np.concatenate([np.zeros(pdf.shape[:-1] + (1,), np.float32),
                              np.cumsum(pdf, -1)], -1)
        grid = np.sort(np.asarray(jax.random.uniform(jax.random.PRNGKey(4), (Sf + 1,))))
        unif = np.broadcast_to(0.5 * (grid[:-1] + grid[1:]), cdf.shape[:-1] + (Sf,))
        idx = (cdf[..., :, None] <= unif[..., None, :]).sum(-2)
        depth_bin = np.linspace(dmin, dmax, Sc + 1).astype(np.float32)
        d_lo = depth_bin[np.clip(idx - 1, 0, Sc)]
        d_hi = depth_bin[np.clip(idx, 0, Sc)]
        c_lo = np.take_along_axis(cdf, np.clip(idx - 1, 0, Sc), -1)
        c_hi = np.take_along_axis(cdf, np.clip(idx, 0, Sc), -1)
        t = (unif - c_lo) / (c_hi - c_lo + 1e-8)
        want = d_lo + t * (d_hi - d_lo)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSeparableConv:
    def test_separable_equals_full_3d_conv(self):
        """conv3d_separable_replicate(k1d) == conv3d_replicate(outer(k1d^3))
        for the binomial and Gaussian kernels (both exactly separable)."""
        from poseprobe_tpu.ops import grid as grid_ops

        rng = np.random.RandomState(0)
        g = jnp.asarray(rng.rand(3, 9, 8, 7).astype(np.float32))

        k1 = grid_ops.binomial_kernel_1d()
        k3 = jnp.einsum("i,j,k->ijk", k1, k1, k1)
        a = grid_ops.conv3d_separable_replicate(g, k1)
        b = grid_ops.conv3d_replicate(g, k3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        k1g = grid_ops.gaussian_kernel_1d(5, 0.8)
        k3g = grid_ops.gaussian_kernel_3d(5, 0.8)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("i,j,k->ijk", k1g, k1g, k1g)),
            np.asarray(k3g), atol=1e-7)
        a = grid_ops.conv3d_separable_replicate(g, k1g)
        b = grid_ops.conv3d_replicate(g, k3g)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestWindowGridOps:
    """(2,2,2) block gather/scatter parity vs the per-corner row path.

    Window scatter is the default (measured 36x/3x faster on TPU v5e);
    window gather is opt-in (measured slower). Both variants must agree
    with the plain row path bit-for-bit-ish."""

    def test_window_vjps_match_row_path(self, monkeypatch):
        from poseprobe_tpu.ops import grid as G

        lo, hi = jnp.zeros(3), jnp.ones(3)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (311, 3)) * 1.3 - 0.15

        for C in (1, 12):
            grid = jax.random.normal(jax.random.PRNGKey(C), (C, 9, 10, 11))

            def loss(g, p):
                return (G.trilinear_sample(g, p, lo, hi) ** 2).sum()

            def loss_vg(g, p):
                v, gr = G.trilinear_sample_with_grad(g, p, lo, hi)
                return (v ** 2).sum() + (gr ** 2).sum()

            monkeypatch.setenv("POSEPROBE_WINDOW_SCATTER", "0")
            ref = [jax.value_and_grad(loss, argnums=(0, 1))(grid, pts),
                   jax.value_and_grad(loss_vg, argnums=(0, 1))(grid, pts)]
            monkeypatch.setenv("POSEPROBE_WINDOW_SCATTER", "1")
            monkeypatch.setenv("POSEPROBE_WINDOW_GATHER", "1")
            win = [jax.value_and_grad(loss, argnums=(0, 1))(grid, pts),
                   jax.value_and_grad(loss_vg, argnums=(0, 1))(grid, pts)]
            monkeypatch.delenv("POSEPROBE_WINDOW_GATHER")
            monkeypatch.delenv("POSEPROBE_WINDOW_SCATTER")
            for r, w in zip(jax.tree.leaves(ref), jax.tree.leaves(win)):
                np.testing.assert_allclose(np.asarray(r), np.asarray(w),
                                           atol=1e-5, rtol=1e-5)
