"""Multi-device parity: the sharded train step must match single-chip numerics.

The data-parallel design (SURVEY.md §2.3) shards only the per-step ray batches
over a 1-D ``('data',)`` mesh via `with_sharding_constraint`; parameters stay
replicated and GSPMD inserts the gradient psum. Because the sharding constraint
does not change the math — only the layout — the loss and the updated
parameters from one step on an 8-device mesh must agree with the same step on a
single device (same seed, same data) to float32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseprobe_tpu.parallel.mesh import make_mesh, shard_rays

# heavy-compile module: slow tier (round-4 verdict weak #7); iterate with
# `pytest -m fast`, run this tier with `pytest -m slow`
pytestmark = pytest.mark.slow


def _make_trainer(mesh, n_rand=64, rand_rays=48):
    from poseprobe_tpu.config import config as cfg_mod
    from poseprobe_tpu.data.synthetic import make_synthetic_scene
    from poseprobe_tpu.models.object_sdf import ObjectConfig
    from poseprobe_tpu.models.scene_nerf import SceneConfig
    from poseprobe_tpu.train.trainer import JointTrainer

    data = make_synthetic_scene(n_train=3, n_test=1, H=24, W=24, seed=0)
    margin = float(data.xyz_max[0])
    cfg = cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=False, barf_c2f=None),
        pnp=cfg_mod.PnPConfig(use_pnp=False),
        object_model=ObjectConfig(
            xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
            num_voxels=16**3, num_voxels_base=16**3, N_iters=200,
            barf_c2f=None, world_bound_scale=1.25),
        object_train=cfg_mod.ObjectTrainConfig(
            N_iters=200, N_rand=n_rand, decay_step_module=(), tv_updates=(),
            weight_tv_density=0.0, weight_tv_k0=0.0),
        scene_model=SceneConfig(
            layers_feat=(32,) * 4, layers_rgb=(16, 3), skip=(2,), L_3D=4, L_view=2,
            sample_intvs=16, sample_intvs_fine=16, rand_rays=rand_rays,
            max_iter=400, barf_c2f=None, fine_sampling=True,
            ratio_start_fine_sampling_at_x=0.0),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=400,
                                             start_ratio_depth_cons=0.0),
    )
    return JointTrainer(cfg, data, seed=0, mesh=mesh)


def test_eight_devices_provisioned():
    assert len(jax.devices()) >= 8, "conftest must provision 8 virtual CPU devices"


def test_shard_rays_preserves_values():
    mesh = make_mesh(jax.devices()[:8])
    x = jnp.arange(8 * 16 * 3, dtype=jnp.float32).reshape(8 * 16, 3)

    @jax.jit
    def f(x):
        return shard_rays(x, mesh) * 2.0

    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x) * 2.0)


@pytest.mark.slow
def test_sharded_train_step_matches_single_chip():
    """One full joint train step: 1-device vs 8-device mesh, identical state/rng."""
    mesh8 = make_mesh(jax.devices()[:8])
    t1 = _make_trainer(mesh=None)
    t8 = _make_trainer(mesh=mesh8)

    # identical init (same seed) — sanity-check before stepping
    for a, b in zip(jax.tree.leaves(t1.state.scene_params),
                    jax.tree.leaves(t8.state.scene_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = jax.random.PRNGKey(42)
    m1 = t1.step_once(rng)
    m8 = t8.step_once(rng)

    l1, l8 = float(m1["loss_total"]), float(m8["loss_total"])
    assert np.isfinite(l1) and np.isfinite(l8)
    assert abs(l1 - l8) <= 1e-5 * max(1.0, abs(l1)), (l1, l8)

    # updated parameters agree leaf-by-leaf (grad psum == single-chip grad)
    for a, b in zip(jax.tree.leaves(t1.state.scene_params),
                    jax.tree.leaves(t8.state.scene_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(t1.state.obj_params),
                    jax.tree.leaves(t8.state.obj_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_sharded_multi_step_stays_finite():
    """A few sharded steps across phase flags keep producing finite losses."""
    mesh8 = make_mesh(jax.devices()[:8])
    t8 = _make_trainer(mesh=mesh8)
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        key, rng = jax.random.split(key)
        m = t8.step_once(rng)
        assert np.isfinite(float(m["loss_total"]))


class TestMultihostInit:
    """Argument/env resolution of `parallel.multihost.init_distributed`
    (`jax.distributed.initialize` itself is mocked — no multi-host here)."""

    def _patch(self, monkeypatch):
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        return calls

    def test_single_process_is_noop(self, monkeypatch):
        from poseprobe_tpu.parallel import multihost
        calls = self._patch(monkeypatch)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        assert multihost.init_distributed() is False
        assert multihost.init_distributed(num_processes=1) is False
        assert calls == []

    def test_env_resolution(self, monkeypatch):
        from poseprobe_tpu.parallel import multihost
        calls = self._patch(monkeypatch)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        assert multihost.init_distributed() is True
        assert calls == [dict(coordinator_address="10.0.0.1:1234",
                              num_processes=4, process_id=2)]

    def test_args_override_env(self, monkeypatch):
        from poseprobe_tpu.parallel import multihost
        calls = self._patch(monkeypatch)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        multihost.init_distributed(coordinator_address="10.9.9.9:999",
                                   num_processes=2, process_id=0)
        assert calls == [dict(coordinator_address="10.9.9.9:999",
                              num_processes=2, process_id=0)]

    def test_missing_process_id_raises(self, monkeypatch):
        from poseprobe_tpu.parallel import multihost
        self._patch(monkeypatch)
        monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        with pytest.raises(ValueError):
            multihost.init_distributed(num_processes=2)
