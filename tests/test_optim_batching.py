"""Optimizer schedules and batch-sampling distribution tests."""
import jax
import jax.numpy as jnp
import numpy as np

from poseprobe_tpu.config.config import ObjectTrainConfig, SceneTrainConfig
from poseprobe_tpu.train import batching, optim


class TestObjectOptimizer:
    def test_lr_decay_matches_reference_formula(self):
        # lr *= 0.1^(1/(lrate_decay*1000)) each step (`recon_scene.py:742-747`)
        cfg = ObjectTrainConfig(lrate_decay=10, decay_step_module=())
        sched = optim._object_lr_schedule(0.1, cfg, "sdf")
        np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(sched(10000)), 0.1 * 0.1, rtol=1e-5)

    def test_staged_decay_events(self):
        cfg = ObjectTrainConfig(
            lrate_decay=10,
            decay_step_module=((100, (("sdf", 0.1),)), (200, (("sdf", 0.5),))))
        sched = optim._object_lr_schedule(1.0, cfg, "sdf")
        base_099 = 0.1 ** (99 / 10000)
        np.testing.assert_allclose(float(sched(99)), base_099, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 0.1 ** (100 / 10000) * 0.1, rtol=1e-5)
        np.testing.assert_allclose(float(sched(200)), 0.1 ** (200 / 10000) * 0.05, rtol=1e-5)

    def test_zero_lr_freezes_module(self):
        cfg = ObjectTrainConfig(lrate_k0=0.0)
        opt = optim.build_object_optimizer(cfg)
        params = {"sdf_grid": jnp.ones((1, 2, 2, 2)), "k0_grid": jnp.ones((3, 2, 2, 2)),
                  "rgbnet": [{"w": jnp.ones((2, 2)), "b": jnp.ones(2)}],
                  "warpnet": {"layers": [{"w": jnp.ones((2, 2)), "b": jnp.ones(2)}],
                              "output_range": jnp.ones(())},
                  "sdf_alpha": jnp.ones(()), "sdf_beta": jnp.ones(()), "s_val": jnp.ones(())}
        st = opt.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        up, _ = opt.update(g, st, params)
        assert float(jnp.abs(up["k0_grid"]).sum()) == 0.0  # frozen
        assert float(jnp.abs(up["s_val"]).sum()) == 0.0    # always frozen
        assert float(jnp.abs(up["sdf_grid"]).sum()) > 0.0

    def test_pose_optimizer_gamma(self):
        cfg = ObjectTrainConfig(lr_pose=1e-3, lr_pose_end=1e-4)
        opt = optim.build_pose_optimizer(cfg, pose_window_steps=1000)
        params = {"se3_refine": jnp.zeros((3, 6)), "se3_align_refine": jnp.zeros((1, 6))}
        st = opt.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        up, _ = opt.update(g, st, params)
        assert float(jnp.abs(up["se3_refine"]).sum()) > 0

    def test_pose_lr_zero_is_frozen(self):
        cfg = ObjectTrainConfig(lr_pose=0.0)
        opt = optim.build_pose_optimizer(cfg, 1000)
        params = {"se3_refine": jnp.zeros((3, 6))}
        up, _ = opt.update(jax.tree.map(jnp.ones_like, params), opt.init(params), params)
        assert float(jnp.abs(up["se3_refine"]).sum()) == 0.0

    def test_scene_lr_schedule_endpoints(self):
        cfg = SceneTrainConfig(max_iter=1000, lr=5e-4, lr_end=1e-4)
        gamma = (cfg.lr_end / cfg.lr) ** (1.0 / cfg.max_iter)
        assert abs(cfg.lr * gamma**1000 - 1e-4) < 1e-8


class TestBatching:
    def test_semantic_class_fractions(self):
        # sampled classes follow the 20/30/50 split (`voxurf_coarse.py:1413`)
        key = jax.random.PRNGKey(0)
        n = 6000
        images = jnp.zeros((2, 8, 8, 3))
        masks = jnp.zeros((2, 8, 8, 1))
        Ks = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        poses = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
        pix = jnp.zeros((2, 3, 4, 2), jnp.int32)
        # distinct pixel markers per class to count draws
        pix = pix.at[:, 0, :, 0].set(1).at[:, 1, :, 0].set(2).at[:, 2, :, 0].set(3)
        counts = jnp.full((2, 3), 4, jnp.int32)
        batch = batching.sample_object_batch(key, n, 2, images, masks, Ks, poses,
                                             pix, counts, inverse_y=True)
        # recover class from the x-coordinate marker embedded in rays:
        # ray dirs encode (x+0.5-cx)/fx with K=I -> dirs_x = x+0.5
        xs = np.asarray(batch.rays_d @ jnp.linalg.inv(poses[0, :3, :3]).T)[:, 0]
        marker = np.round(xs - 0.5)
        frac = [(marker == m).mean() for m in (1, 2, 3)]
        np.testing.assert_allclose(frac, [0.2, 0.3, 0.5], atol=0.03)

    def test_scene_pixels_patch_structure(self):
        key = jax.random.PRNGKey(1)
        images = jnp.zeros((3, 32, 32, 3))
        b = batching.sample_scene_pixels(key, 3, 64, 32, 32, patch_size=2,
                                         images=images, n_active=3)
        px = np.asarray(b.pixels).reshape(-1, 4, 2)  # [n_patches, 2x2, 2]
        # each patch is a contiguous 2x2 block
        assert ((px[:, 1] - px[:, 0]) == [1, 0]).all()
        assert ((px[:, 2] - px[:, 0]) == [0, 1]).all()
        assert ((px[:, 3] - px[:, 0]) == [1, 1]).all()
        assert px[..., 0].max() <= 31 and px[..., 1].max() <= 31
