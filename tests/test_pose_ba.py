"""Match-based bundle-adjustment pose polish (pose_init/ba.py).

The round-3 6-view translation plateau (t x100 ~4, budget-independent,
VERDICT weak #4) is injected at view activations and locked in by
scene-NeRF co-adaptation; the BA polish attacks it through the one signal
the renderer cannot co-adapt to — the match packs themselves.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from poseprobe_tpu.core import align, lie
from poseprobe_tpu.data import synthetic
from poseprobe_tpu.pose_init import ba as ba_mod


def _scene(noise=0.0, outl=0.0, source="analytic", res=64, n_train=6):
    return synthetic.make_synthetic_scene(
        n_train=n_train, n_test=0, H=res, W=res, seed=0, n_matches=128,
        match_noise_px=noise, match_outlier_frac=outl, match_source=source,
        texture="noise" if source != "analytic" else "checker")


def _obs(d, n_active=None):
    n = d.n_train
    packs, pairs = [], []
    for i in range(1, n):
        j = int(d.pair_j[i])
        packs.append(d.scene_matches[i])
        pairs.append((j, i))
        packs.append(d.obj_matches[i])
        pairs.append((j, i))
    for pack, ab in zip(d.ba_matches, d.ba_pairs):
        packs.append(pack)
        pairs.append((int(ab[0]), int(ab[1])))
    return ba_mod.observations_from_packs(packs, pairs, n_active or n)


def _perturb(gt, seed=3, t_sigma=0.05, r_sigma=0.01):
    rng = np.random.default_rng(seed)
    pert = gt.copy()
    for i in range(1, len(gt)):
        pert[i, :, 3] += rng.normal(0, t_sigma, 3)
        w = rng.normal(0, r_sigma, 3)
        R = np.asarray(lie.so3_to_SO3(jnp.asarray(w, jnp.float32)[None]))[0]
        pert[i, :, :3] = R @ pert[i, :, :3]
    return pert


def _aligned_err(poses, gt):
    a, _ = align.prealign_w2c_small_camera_systems(
        np.asarray(poses, np.float32), gt.astype(np.float32))
    e = align.evaluate_camera_alignment(a, gt.astype(np.float32))
    return float(np.asarray(e["R"]).mean()), float(np.asarray(e["t"]).mean())


class TestObservations:
    def test_inactive_views_dropped(self):
        d = _scene(n_train=4)
        obs_full = _obs(d, n_active=4)
        obs_partial = _obs(d, n_active=2)
        views_full = {v for o in obs_full for v in o[:2]}
        views_partial = {v for o in obs_partial for v in o[:2]}
        assert views_full == {0, 1, 2, 3}
        assert views_partial <= {0, 1}
        assert len(obs_partial) < len(obs_full)

    def test_sparse_packs_dropped(self):
        pk = np.zeros((1, 16, 5), np.float32)
        pk[0, :5, 4] = 1.0  # only 5 valid matches (< 8)
        assert ba_mod.observations_from_packs(pk, [(0, 1)], 2) == []


class TestPolish:
    def test_exact_recovery_on_clean_matches(self):
        """Perturbed poses (the activation-injection scale: t ~0.05/view,
        R ~0.6 deg) recover EXACTLY from clean analytic matches — the
        6-view injection benchmark the module docstring quotes."""
        d = _scene()
        gt = d.poses_gt_w2c[d.i_train].astype(np.float64)
        pert = _perturb(gt)
        r0, t0 = _aligned_err(pert, gt)
        assert t0 > 5.0  # the injection is material
        pol, info = ba_mod.polish_poses_matches(pert, d.Ks[d.i_train],
                                                _obs(d), fix_first=True)
        assert info["applied"] and info["stage"] == "free"
        r1, t1 = _aligned_err(pol, gt)
        assert r1 < 0.05, f"R {r1:.3f} deg"
        assert t1 < 0.3, f"t x100 {t1:.2f}"
        # ratio is vs the PERTURBED start, whose baselines were ~9% off GT
        assert 0.85 < info["baseline_ratio"] < 1.15

    def test_precision_override_beats_baseline_guard(self):
        """A LARGE clean-match injection (t_sigma 0.1: baselines move far
        outside the 0.90-1.11 ratio band) must still recover exactly via
        the free stage: when the solve explains the matches to sub-noise
        precision, baseline movement is the CORRECTION, not a collapse
        (round-5 ba_noise_study — the prior stage used to cap such fixes
        at roughly half)."""
        d = _scene()
        gt = d.poses_gt_w2c[d.i_train].astype(np.float64)
        pert = _perturb(gt, seed=11, t_sigma=0.1, r_sigma=0.02)
        pol, info = ba_mod.polish_poses_matches(pert, d.Ks[d.i_train],
                                                _obs(d), fix_first=True)
        assert info["applied"] and info["stage"] == "free"
        assert info["free_med_px"] < 0.05
        r1, t1 = _aligned_err(pol, gt)
        assert r1 < 0.05, f"R {r1:.3f} deg"
        assert t1 < 0.3, f"t x100 {t1:.2f}"

    def test_declines_on_noisy_matches(self):
        """1 px noise + 15% outliers at 64 px: BA cannot beat the trainer's
        photometric machinery there (measured: lands worse than the input),
        so the quality gate must DECLINE and return the input unchanged."""
        d = _scene(noise=1.0, outl=0.15)
        gt = d.poses_gt_w2c[d.i_train].astype(np.float64)
        pert = _perturb(gt)
        pol, info = ba_mod.polish_poses_matches(pert, d.Ks[d.i_train],
                                                _obs(d), fix_first=True)
        assert not info["applied"]
        assert "rejected_noise_px" in info or "rejected_baseline_ratio" in info
        np.testing.assert_allclose(pol, pert.astype(np.float32), atol=1e-6)

    def test_no_op_without_observations(self):
        d = _scene(n_train=3)
        gt = d.poses_gt_w2c[d.i_train].astype(np.float64)
        pol, info = ba_mod.polish_poses_matches(gt, d.Ks[d.i_train], [],
                                                fix_first=True)
        assert not info["applied"]
        np.testing.assert_allclose(pol, gt.astype(np.float32), atol=1e-6)

    @pytest.mark.slow
    def test_classical_matcher_packs(self):
        """The real-matcher protocol (SIFT on 128 px noise-texture renders):
        the polish must cut the injected t error below the round-3 plateau."""
        d = _scene(source="classical", res=128)
        gt = d.poses_gt_w2c[d.i_train].astype(np.float64)
        pert = _perturb(gt)
        _, t0 = _aligned_err(pert, gt)
        pol, info = ba_mod.polish_poses_matches(pert, d.Ks[d.i_train],
                                                _obs(d), fix_first=True)
        assert info["applied"]
        r1, t1 = _aligned_err(pol, gt)
        assert r1 < 0.2, f"R {r1:.3f} deg"
        assert t1 < 2.0 < t0, f"t x100 {t1:.2f} (from {t0:.2f})"


class TestTrainerEvent:
    def test_ba_event_rewrites_poses(self):
        """polish_poses_ba at a scheduled step: poses_pnp rewritten, active
        refinement rows zeroed, and the BA step is a scan-window boundary."""
        import dataclasses

        from poseprobe_tpu.config import config as cfg_mod
        from poseprobe_tpu.models.object_sdf import ObjectConfig
        from poseprobe_tpu.models.scene_nerf import SceneConfig
        from poseprobe_tpu.train.trainer import JointTrainer

        d = _scene(n_train=3, res=32)
        margin = float(d.xyz_max[0])
        cfg = cfg_mod.ExperimentConfig(
            data=cfg_mod.DataConfig(near=d.near, far=d.far),
            camera=cfg_mod.CameraConfig(incremental=False, noise=0.05,
                                        ba_at_ratios=(0.5,), barf_c2f=None),
            pnp=cfg_mod.PnPConfig(use_pnp=False),
            object_model=ObjectConfig(
                xyz_min=(-margin,) * 3, xyz_max=(margin,) * 3,
                num_voxels=24**3, num_voxels_base=24**3, N_iters=6,
                world_bound_scale=1.25),
            object_train=cfg_mod.ObjectTrainConfig(N_iters=6, N_rand=64),
            scene_model=SceneConfig(rand_rays=64, sample_intvs=16,
                                    sample_intvs_fine=16, max_iter=20,
                                    fine_sampling=False),
            scene_train=cfg_mod.SceneTrainConfig(max_iter=20),
        )
        tr = JointTrainer(cfg, d)
        assert 10 in tr._ba_steps()
        assert tr._next_boundary(8) == 10
        before = np.asarray(tr.state.poses_pnp).copy()
        tr.fit(14)
        info = None  # event already ran inside fit at step 10
        after = np.asarray(tr.state.poses_pnp)
        refine = np.asarray(tr.state.pose_params["se3_refine"])
        # noisy-GT seeds + clean matches: BA rewrote the anchors
        assert not np.allclose(before, after)
        assert np.abs(refine[: tr.state.n_active]).max() < 0.02


class TestViewMatchRefine:
    """Round-5 activation rescue: single-view LM on the view's own match
    packs recovers degenerate PnP solves (self-consistent anchors, 6-12 deg
    off) that the photometric and holdout referees miss."""

    def _degenerate(self, d, view=3, deg=12.0):
        gt = d.poses_gt_w2c[d.i_train].astype(np.float64)
        rng = np.random.default_rng(0)
        w = rng.standard_normal(3)
        w *= np.deg2rad(deg) / np.linalg.norm(w)
        R = np.asarray(lie.so3_to_SO3(jnp.asarray(w, jnp.float32)[None]))[0]
        bad = gt.copy()
        bad[view, :, :3] = R @ gt[view, :, :3]
        bad[view, :, 3] += 0.25 * rng.standard_normal(3)
        return gt, bad

    def test_recovers_12deg_activation(self):
        d = _scene()
        gt, bad = self._degenerate(d)
        view = 3
        obs = _obs(d, n_active=view + 1)
        pose, info = ba_mod.refine_view_matches(
            bad, d.Ks[d.i_train], obs, view,
            starts=[("pnp", bad[view]), ("prev", bad[view - 1])])
        assert info["applied"] and info["med_px"] < 0.1
        fixed = bad.copy()
        fixed[view] = pose
        r, t = _aligned_err(fixed[:view + 1], gt[:view + 1])
        assert r < 0.05 and t < 0.5, (r, t)

    def test_declines_on_garbage_matches(self):
        """Pure-outlier packs must converge to a HIGH residual (the
        trainer's acceptance gate then declines)."""
        d = _scene(noise=0.0, outl=1.0)
        gt, bad = self._degenerate(d)
        view = 3
        obs = _obs(d, n_active=view + 1)
        pose, info = ba_mod.refine_view_matches(
            bad, d.Ks[d.i_train], obs, view,
            starts=[("pnp", bad[view])])
        assert (not info["applied"]) or info["med_px"] > 1.0

    def test_no_op_without_observations(self):
        d = _scene()
        gt, bad = self._degenerate(d)
        pose, info = ba_mod.refine_view_matches(bad, d.Ks[d.i_train], [], 3)
        assert not info["applied"]
        np.testing.assert_allclose(pose, bad[3].astype(np.float32))

    def test_far_field_degenerate_solution_rejected(self):
        """Noisy near-planar packs admit an UNBOUNDED degenerate direction
        (the view recedes while its own triangulations chase it — observed
        at 16k world units with med 0.21 px in the r5 noise run). Any
        refined pose farther than 10x the partner baseline from the
        trusted set must be discarded."""
        d = _scene(noise=0.25, outl=0.15, res=128)
        gt, bad = self._degenerate(d, deg=8.0)
        view = 3
        obs = _obs(d, n_active=view + 1)
        pose, info = ba_mod.refine_view_matches(
            bad, d.Ks[d.i_train], obs, view,
            starts=[("pnp", bad[view]), ("prev", bad[view - 1])])
        c = -pose[:, :3].T @ pose[:, 3]
        centers = np.stack([-p[:, :3].T @ p[:, 3] for p in gt[:view]])
        base = np.linalg.norm(centers[:, None] - centers[None], axis=-1).max()
        assert np.linalg.norm(c - centers.mean(0)) <= 10 * base + 1.0
