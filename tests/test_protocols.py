"""Pose-protocol wiring: noisy-GT (BARF-style) and GT-seeded no-PnP regimes.

The reference supports three pose-initialization protocols
(`lib/recon_scene.py:51-74`): PnP-seeded (`get_current_pose_pnp`), noisy-GT
(`get_current_pose`: refine∘noise∘GT, `configs/dtu_e2e/coarse.py:36`
camera.noise=0.15 semantics), and GT-seeded (toy desk1 / replica,
`configs/toy/desk1.py:45-52`). These tests pin the trainer-side wiring the
converged queue27/queue30 runs rely on: seed composition, activation
seeding without PnP, gauge fixing, and live pose refinement.
"""
import dataclasses
import io
from contextlib import redirect_stdout

import jax
import numpy as np

from poseprobe_tpu.config import config as cfg_mod
from poseprobe_tpu.core import pose as pose_ops
from poseprobe_tpu.data.synthetic import make_synthetic_scene
from poseprobe_tpu.models.object_sdf import ObjectConfig
from poseprobe_tpu.models.scene_nerf import SceneConfig
from poseprobe_tpu.train.trainer import JointTrainer


def _cfg(data, noise=0.0, use_pnp=False, incremental_step=4):
    m = float(data.xyz_max[0])
    return cfg_mod.ExperimentConfig(
        data=cfg_mod.DataConfig(near=data.near, far=data.far),
        camera=cfg_mod.CameraConfig(incremental=True, noise=noise,
                                    incremental_step=incremental_step),
        pnp=cfg_mod.PnPConfig(use_pnp=use_pnp),
        object_model=ObjectConfig(xyz_min=(-m,) * 3, xyz_max=(m,) * 3,
                                  num_voxels=12**3, num_voxels_base=12**3,
                                  N_iters=100),
        object_train=cfg_mod.ObjectTrainConfig(N_iters=100, N_rand=32,
                                               lr_pose=1e-3, lr_pose_end=1e-4),
        scene_model=SceneConfig(rand_rays=48, sample_intvs=16,
                                sample_intvs_fine=16, max_iter=200,
                                fine_sampling=False),
        scene_train=cfg_mod.SceneTrainConfig(max_iter=200, precrop_iters=0),
    )


def _scene():
    return make_synthetic_scene(n_train=3, n_test=1, H=32, W=32, seed=0,
                                n_matches=16)


def test_noise_seed_composition():
    """noise>0, no PnP: poses_pnp = noise∘GT (reference recon_scene.py:56-57)."""
    data = _scene()
    t = JointTrainer(_cfg(data, noise=0.3), data, seed=0)
    want = np.asarray(pose_ops.compose_pair(t.pose_noise, t.poses_gt))
    np.testing.assert_allclose(np.asarray(t.state.poses_pnp), want, atol=1e-6)
    # the perturbation is real: seeded poses differ from GT
    assert np.abs(want - np.asarray(t.poses_gt)).max() > 1e-2
    # noisy-GT mode refines ALL poses (no PnP gauge anchor at view 0)
    assert t._fix_first_pose is False


def test_gt_seed_composition():
    """noise=0, no PnP (toy desk1 / replica): poses_pnp = GT exactly."""
    data = _scene()
    t = JointTrainer(_cfg(data, noise=0.0), data, seed=0)
    np.testing.assert_allclose(np.asarray(t.state.poses_pnp),
                               np.asarray(t.poses_gt), atol=1e-7)


def test_activation_seeds_from_noisy_gt_not_pnp():
    """View activation without PnP must seed from poses_pnp and say so."""
    data = _scene()
    t = JointTrainer(_cfg(data, noise=0.3, incremental_step=4), data, seed=0)
    assert t.state.n_active == 2
    buf = io.StringIO()
    with redirect_stdout(buf):
        t.maybe_activate_view(4)
    out = buf.getvalue()
    assert t.state.n_active == 3
    assert "seed (gt+noise)" in out, out
    # the activated pose is exactly the noisy-GT seed (refine rows are zero)
    cur = t.current_pose_host()
    np.testing.assert_allclose(cur[2], np.asarray(t.state.poses_pnp[2]),
                               atol=1e-5)


def test_pose_refinement_live_in_noise_regime():
    """lr_pose>0 ⇒ se3_refine moves within the pose window (the queue27 run
    showed R drifting, i.e. the optimizer is live — pin that here)."""
    data = _scene()
    t = JointTrainer(_cfg(data, noise=0.3), data, seed=0)
    t.step_once(jax.random.PRNGKey(0))
    refine = np.asarray(t.state.pose_params["se3_refine"])
    per_view = np.abs(refine).max(axis=1)
    assert per_view[0] > 0.0 and per_view[1] > 0.0, per_view  # active views move
    assert per_view[2] == 0.0, per_view  # inactive view stays untouched
