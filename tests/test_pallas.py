"""Pallas fused compositing kernel: parity with the jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from poseprobe_tpu.ops.pallas import fused_composite as FC


def make_inputs(N=256, S=40, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    sdf = jax.random.normal(ks[0], (N, S)) * 0.5
    cos = -jnp.abs(jax.random.normal(ks[1], (N, S)))
    mask = jax.random.uniform(ks[2], (N, S)) > 0.2
    rgb = jax.random.uniform(ks[3], (N, S, 3))
    step = jnp.cumsum(jnp.abs(jax.random.normal(ks[4], (N, S))) * 0.01, axis=1)
    return sdf, cos, mask, rgb, step


class TestFusedComposite:
    def test_reference_matches_unfused_ops(self):
        # the jnp twin must equal the compositional ops it replaces
        from poseprobe_tpu.ops import compositing
        sdf, cos, mask, rgb, step = make_inputs()
        w, ainv, rgbm, nstep = FC._jnp_reference(sdf, cos, mask, rgb, step, 10.0, 0.02)
        est_next = sdf + cos * 0.01
        est_prev = sdf - cos * 0.01
        alpha = jnp.clip((jax.nn.sigmoid(est_prev * 10) - jax.nn.sigmoid(est_next * 10) + 1e-5)
                         / (jax.nn.sigmoid(est_prev * 10) + 1e-5), 0, 1)
        alpha = jnp.where(mask, alpha, 0.0)
        w2, ainv2 = compositing.alpha2weights(alpha)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ainv), np.asarray(ainv2), atol=1e-6)

    def test_kernel_matches_reference_interpret(self):
        # run the actual Pallas kernel in interpreter mode and compare
        from jax.experimental import pallas as pl
        sdf, cos, mask, rgb, step = make_inputs(N=FC.BLOCK_RAYS, S=24)
        ref = FC._jnp_reference(sdf, cos, mask, rgb, step, 8.0, 0.05)

        import functools
        orig = pl.pallas_call
        with _interpret_pallas():
            out = _force_tpu_path(sdf, cos, mask, rgb, step, 8.0, 0.05)
        for a, b, name in zip(out, ref, ["weights", "alphainv", "rgb", "nstep"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                       err_msg=name)

    def test_gradients_flow(self):
        sdf, cos, mask, rgb, step = make_inputs(N=64, S=16)

        def loss(sdf, rgb):
            w, ainv, rgbm, nstep = FC.fused_alpha_composite(sdf, cos, mask, rgb, step, 8.0, 0.05)
            return rgbm.sum() + nstep.sum() + w.sum() * 0.1

        g1, g2 = jax.grad(loss, argnums=(0, 1))(sdf, rgb)
        assert np.all(np.isfinite(np.asarray(g1)))
        assert float(jnp.abs(g2).sum()) > 0


import contextlib


@contextlib.contextmanager
def _interpret_pallas():
    from jax.experimental import pallas as pl
    import functools
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        yield
    finally:
        pl.pallas_call = orig


def _force_tpu_path(sdf, cos, mask, rgb, step, inv_s, dist):
    """Invoke the pallas code path regardless of platform (interpret mode)."""
    import poseprobe_tpu.ops.pallas.fused_composite as FCm
    N, S = sdf.shape
    S_pad = -(-S // 8) * 8
    pad = S_pad - S
    import jax.numpy as jnp
    sdf_t = jnp.pad(sdf, ((0, 0), (0, pad)), constant_values=1.0).T
    cos_t = jnp.pad(cos, ((0, 0), (0, pad))).T
    mask_t = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad))).T
    step_t = jnp.pad(step, ((0, 0), (0, pad))).T
    nb = N // FCm.BLOCK_RAYS
    rgb_p = jnp.pad(rgb, ((0, 0), (0, pad), (0, 0)))
    rgb_t = jnp.moveaxis(rgb_p, 0, 1).reshape(S_pad, nb, FCm.BLOCK_RAYS, 3)
    rgb_t = jnp.swapaxes(rgb_t, 2, 3).reshape(S_pad, nb * 3 * FCm.BLOCK_RAYS)
    scalars = jnp.stack([jnp.asarray(inv_s, jnp.float32), jnp.asarray(dist, jnp.float32)])
    w_t, ainv, rgbm, nstep = FCm._pallas_forward(sdf_t, cos_t, mask_t, rgb_t, step_t, scalars, S_pad, N)
    rgbm = rgbm.reshape(nb, 3, FCm.BLOCK_RAYS)
    rgbm = jnp.moveaxis(rgbm, 1, 2).reshape(N, 3)
    return w_t.T[:, :S], ainv[0], rgbm, nstep[0]


class TestFusedTrunk:
    """ops/pallas/fused_mlp vs the XLA bf16 trunk (interpret mode)."""

    H, L, SKIP, D = 128, 3, 1, 39

    def _layers(self):
        from poseprobe_tpu.models.mlp import init_linear
        keys = jax.random.split(jax.random.PRNGKey(1), self.L)
        layers = []
        for l in range(self.L):
            d_in = self.D if l == 0 else self.H
            if l == self.SKIP:
                d_in += self.D
            d_out = self.H + 1 if l == self.L - 1 else self.H
            layers.append(init_linear(keys[l], d_in, d_out, "xavier_relu"))
        return layers

    def _xla_trunk(self, layers, enc):
        feat = encb = enc.astype(jnp.bfloat16)
        for li, layer in enumerate(layers):
            if li == self.SKIP:
                feat = jnp.concatenate([feat, encb], axis=-1)
            w = layer["w"].astype(jnp.bfloat16)
            b = layer["b"].astype(jnp.bfloat16)
            feat = jax.lax.dot_general(feat, w, (((1,), (0,)), ((), ())),
                                       preferred_element_type=feat.dtype) + b
            if li == self.L - 1:
                raw = feat[..., 0].astype(jnp.float32)
                feat = feat[..., 1:]
            feat = jax.nn.relu(feat)
        return raw, feat

    def test_forward_parity(self):
        from poseprobe_tpu.ops.pallas import fused_mlp
        layers = self._layers()
        enc = jax.random.normal(jax.random.PRNGKey(2), (700, self.D))  # non-TILE-multiple
        raw_ref, feat_ref = self._xla_trunk(layers, enc)
        raw_f, feat_f = fused_mlp.fused_trunk(enc, layers, self.SKIP, interpret=True)
        np.testing.assert_allclose(np.asarray(raw_f), np.asarray(raw_ref), atol=1e-2)
        np.testing.assert_allclose(np.asarray(feat_f, dtype=np.float32),
                                   np.asarray(feat_ref, dtype=np.float32), atol=1e-2)

    def test_gradient_parity(self):
        from poseprobe_tpu.ops.pallas import fused_mlp
        layers = self._layers()
        enc = jax.random.normal(jax.random.PRNGKey(3), (512, self.D))

        def loss(trunk):
            def f(params, enc):
                raw, feat = trunk(params, enc)
                return jax.nn.softplus(raw).sum() + (feat.astype(jnp.float32) ** 2).sum()
            return f

        g_ref = jax.grad(loss(lambda p, e: self._xla_trunk(p, e)))(layers, enc)
        g_fus = jax.grad(loss(lambda p, e: fused_mlp.fused_trunk(
            e, p, self.SKIP, interpret=True)))(layers, enc)
        for l in range(self.L):
            for k in ("w", "b"):
                a, b = np.asarray(g_ref[l][k]), np.asarray(g_fus[l][k])
                assert np.abs(a - b).max() <= 2e-2 * (np.abs(a).max() + 1e-6), (l, k)
        ge_ref = jax.grad(loss(lambda p, e: self._xla_trunk(p, e)), argnums=1)(layers, enc)
        ge_fus = jax.grad(loss(lambda p, e: fused_mlp.fused_trunk(
            e, p, self.SKIP, interpret=True)), argnums=1)(layers, enc)
        assert np.abs(np.asarray(ge_ref - ge_fus)).max() <= 2e-2 * np.abs(ge_ref).max()

    def test_supports_production_config(self):
        from poseprobe_tpu.models.scene_nerf import SceneConfig
        from poseprobe_tpu.ops.pallas import fused_mlp
        assert fused_mlp.supports(SceneConfig())                       # 8x256, skip 4
        assert not fused_mlp.supports(SceneConfig(layers_feat=(48,) * 4, skip=(2,)))
        assert not fused_mlp.supports(SceneConfig(skip=(1, 4)))

    def test_variant_parity(self):
        """BWD_WT/INTERLEAVE tuning variants vs the baseline kernel.

        --wt (pre-transposed bwd weights) is bit-exact everywhere.
        INTERLEAVE>1 is bit-exact for the forward and the enc gradient
        (per-row computations); dW/db sum the SAME per-point products in a
        different order (split-tile f32 partial sums), so they are compared
        allclose, not equal.
        """
        from poseprobe_tpu.ops.pallas import fused_mlp
        layers = self._layers()
        enc = jax.random.normal(jax.random.PRNGKey(5), (1024, self.D))

        def f(params, enc):
            raw, feat = fused_mlp.fused_trunk(enc, params, self.SKIP,
                                              interpret=True, tile=512)
            return jax.nn.softplus(raw).sum() + (feat.astype(jnp.float32) ** 2).sum()

        def run(wt, il):
            old = fused_mlp.BWD_WT, fused_mlp.INTERLEAVE
            fused_mlp.BWD_WT, fused_mlp.INTERLEAVE = wt, il
            try:
                val, (gp, ge) = jax.value_and_grad(f, argnums=(0, 1))(layers, enc)
            finally:
                fused_mlp.BWD_WT, fused_mlp.INTERLEAVE = old
            return val, gp, ge

        val0, gp0, ge0 = run(False, 1)
        for wt, il in [(True, 1), (False, 2), (True, 2)]:
            val, gp, ge = run(wt, il)
            assert np.array_equal(np.asarray(val0), np.asarray(val)), (wt, il)
            assert np.array_equal(np.asarray(ge0), np.asarray(ge)), (wt, il)
            for l in range(self.L):
                for k in ("w", "b"):
                    a, b = np.asarray(gp0[l][k]), np.asarray(gp[l][k])
                    if il == 1:
                        assert np.array_equal(a, b), (wt, il, l, k)
                    else:
                        assert np.abs(a - b).max() <= 1e-2 * (np.abs(a).max() + 1e-6), \
                            (wt, il, l, k)

    def test_ckpt_variant_parity(self):
        """Activation-store variants (ckpt=1 full store, ckpt=2 stride-2) vs
        full remat (ckpt=0): bit-exact, since the stored activations are the
        same bf16 values the remat recomputes and the backward consumes them
        in the same order/dtypes."""
        from poseprobe_tpu.ops.pallas import fused_mlp
        layers = self._layers()
        enc = jax.random.normal(jax.random.PRNGKey(7), (1024, self.D))

        def run(ckpt):
            def f(params, enc):
                raw, feat = fused_mlp.fused_trunk(enc, params, self.SKIP,
                                                  interpret=True, tile=512,
                                                  ckpt=ckpt)
                return (jax.nn.softplus(raw).sum()
                        + (feat.astype(jnp.float32) ** 2).sum())
            return jax.value_and_grad(f, argnums=(0, 1))(layers, enc)

        val0, (gp0, ge0) = run(0)
        for ckpt in (1, 2):
            val, (gp, ge) = run(ckpt)
            assert np.array_equal(np.asarray(val0), np.asarray(val)), ckpt
            assert np.array_equal(np.asarray(ge0), np.asarray(ge)), ckpt
            for l in range(self.L):
                for k in ("w", "b"):
                    assert np.array_equal(np.asarray(gp0[l][k]),
                                          np.asarray(gp[l][k])), (ckpt, l, k)


class TestPallasRenderPath:
    def test_object_render_pallas_flag_matches_default(self):
        # with the flag on (falls back to jnp twin off-TPU) the render output
        # must match the unfused path exactly
        import dataclasses
        import jax
        from poseprobe_tpu.models import object_sdf
        from poseprobe_tpu.core import pose, rays as rays_mod

        cfg = object_sdf.ObjectConfig(xyz_min=(-1.0,) * 3, xyz_max=(1.0,) * 3,
                                      num_voxels=16**3, num_voxels_base=16**3,
                                      N_iters=100, barf_c2f=None)
        cfg_p = dataclasses.replace(cfg, use_pallas_composite=True)
        params = object_sdf.init_object_params(jax.random.PRNGKey(0), cfg)
        K = jnp.array([[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]])
        c2w = pose.make(R=jnp.eye(3), t=jnp.array([0.0, 0.0, -3.0]))
        ro, rd = rays_mod.get_rays(8, 8, K, c2w, inverse_y=True)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        out1 = object_sdf.render(params, cfg, ro, rd, vd, 50.0, rng=None, near=0.3, far=9.0)
        out2 = object_sdf.render(params, cfg_p, ro, rd, vd, 50.0, rng=None, near=0.3, far=9.0)
        np.testing.assert_allclose(np.asarray(out1["rgb_marched"]),
                                   np.asarray(out2["rgb_marched"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out1["weights"]),
                                   np.asarray(out2["weights"]), atol=1e-6)


class TestLayoutTranspose:
    """ops/pallas/layout.transpose2d — the scatter/gather layout pin."""

    def test_transpose_shapes(self):
        import numpy as np
        from poseprobe_tpu.ops.pallas import layout

        for a, b in [(4096, 12), (12, 4096), (2048, 13), (1000, 12), (12, 999)]:
            x = jax.random.normal(jax.random.PRNGKey(a + b), (a, b))
            y = layout.transpose2d(x, interpret=True)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x).T)

    def test_transpose_slice(self):
        import numpy as np
        from poseprobe_tpu.ops.pallas import layout

        for v, c in [(4096, 12), (1000, 13), (2049, 1)]:
            x = jax.random.normal(jax.random.PRNGKey(v), (v, 128))
            y = layout.transpose_slice(x, c, interpret=True)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[:, :c].T)

    def test_pinned_grid_vjp_matches_barrier_path(self, monkeypatch):
        """The pinned (pallas-transpose) gather/scatter path must be
        numerically identical to the plain path for both trilinear VJPs."""
        import numpy as np
        from poseprobe_tpu.ops import grid as G

        lo, hi = jnp.zeros(3), jnp.ones(3)
        grid = jax.random.normal(jax.random.PRNGKey(0), (12, 16, 16, 16))
        pts = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

        def loss(g, p):
            return (G.trilinear_sample(g, p, lo, hi) ** 2).sum()

        def loss_vg(g, p):
            v, gr = G.trilinear_sample_with_grad(g, p, lo, hi)
            return (v ** 2).sum() + (gr ** 2).sum()

        ref = [jax.grad(loss, argnums=(0, 1))(grid, pts),
               jax.grad(loss_vg, argnums=(0, 1))(grid, pts)]
        monkeypatch.setattr(G, "_pin_layout", lambda: True)  # interpret on CPU
        pin = [jax.grad(loss, argnums=(0, 1))(grid, pts),
               jax.grad(loss_vg, argnums=(0, 1))(grid, pts)]
        for (r, p) in zip(jax.tree.leaves(ref), jax.tree.leaves(pin)):
            np.testing.assert_allclose(np.asarray(r), np.asarray(p),
                                       atol=1e-5, rtol=1e-5)
