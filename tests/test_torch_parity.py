"""Numerical parity against the reference's torch formulations.

These re-implement the exact reference code (NeuS alpha `voxurf_coarse.py:483-519`,
NeRF composite `frequency_nerf.py:283-343`, BARF weights, SE3 exp) in torch and
check our jnp versions match bit-for-bit (up to f32)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from poseprobe_tpu.core import lie
from poseprobe_tpu.ops import compositing, pe


class TestNeusAlphaParity:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        M = 500
        sdf = rng.normal(0, 0.5, M).astype(np.float32)
        grad = rng.normal(0, 1, (M, 3)).astype(np.float32)
        dirs = rng.normal(0, 1, (M, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        dist, s_val = 0.02, 0.15

        # reference formulation (voxurf_coarse.py:494-516)
        t_dirs = torch.from_numpy(dirs)
        t_grad = torch.from_numpy(grad)
        t_sdf = torch.from_numpy(sdf)
        inv_s = 1.0 / s_val
        true_cos = (t_dirs * t_grad).sum(-1, keepdim=True)
        iter_cos = -(torch.nn.functional.relu(-true_cos * 0.5 + 0.5) * 0.0
                     + torch.nn.functional.relu(-true_cos) * 1.0)
        est_next = t_sdf.unsqueeze(-1) + iter_cos * dist * 0.5
        est_prev = t_sdf.unsqueeze(-1) - iter_cos * dist * 0.5
        prev_cdf = torch.sigmoid(est_prev * inv_s)
        next_cdf = torch.sigmoid(est_next * inv_s)
        alpha_ref = ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).clip(0, 1).squeeze()

        alpha = compositing.neus_alpha_from_sdf(jnp.asarray(dirs), dist,
                                                jnp.asarray(sdf), jnp.asarray(grad), s_val)
        np.testing.assert_allclose(np.asarray(alpha), alpha_ref.numpy(), atol=1e-6)


class TestCompositeParity:
    def test_matches_reference_composite(self):
        rng = np.random.default_rng(1)
        B, R, N = 1, 16, 32
        rgb = rng.uniform(0, 1, (B, R, N, 3)).astype(np.float32)
        density = rng.uniform(0, 3, (B, R, N)).astype(np.float32)
        depth = np.sort(rng.uniform(0.5, 4, (B, R, N, 1)).astype(np.float32), axis=2)
        ray = rng.normal(0, 1, (B, R, 3)).astype(np.float32)

        # reference composite (frequency_nerf.py:300-341)
        t_rgb = torch.from_numpy(rgb)
        t_den = torch.from_numpy(density)
        t_dep = torch.from_numpy(depth)
        t_ray = torch.from_numpy(ray)
        ray_len = t_ray.norm(dim=-1, keepdim=True)
        intv = t_dep[..., 1:, 0] - t_dep[..., :-1, 0]
        intv = torch.cat([intv, torch.full_like(intv[..., :1], 1e10)], dim=2)
        sigma_delta = t_den * (intv * ray_len)
        alpha = 1 - (-sigma_delta).exp()
        T = (-torch.cat([torch.zeros_like(sigma_delta[..., :1]),
                         sigma_delta[..., :-1]], dim=2).cumsum(dim=2)).exp()
        all_cum_ref = T[:, :, -2]
        w = (T * alpha)[..., None]
        depth_ref = (t_dep * w).sum(dim=2)
        rgb_ref = (t_rgb * w).sum(dim=2)
        opacity_ref = w.sum(dim=2)

        out = compositing.nerf_composite(jnp.asarray(rgb), jnp.asarray(density),
                                         jnp.asarray(depth), jnp.asarray(ray))
        np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.depth), depth_ref.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.opacity), opacity_ref.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.weights), w.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.all_cumulated), all_cum_ref.numpy(), atol=2e-5)


class TestBarfWeightsParity:
    def test_matches_reference_weights(self):
        # frequency_nerf.py:248-258
        L = 6
        for progress in [0.0, 0.33, 0.5, 0.77, 1.0]:
            start, end = 0.4, 0.7
            alpha = (progress - start) / (end - start) * L
            k = torch.arange(L, dtype=torch.float32)
            w_ref = (1 - (alpha - k).clamp_(min=0, max=1).mul_(np.pi).cos_()) / 2
            w = pe.barf_weights(progress, L, (start, end))
            np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), atol=1e-6)


class TestSE3Parity:
    def test_exp_matches_reference_taylor(self):
        # lib/camera.py:127-142 Taylor-series exp map
        rng = np.random.default_rng(2)
        wu = rng.normal(0, 0.3, (8, 6)).astype(np.float32)
        t_wu = torch.from_numpy(wu)
        w, u = t_wu.split([3, 3], dim=-1)
        wx = torch.zeros(8, 3, 3)
        wx[:, 0, 1], wx[:, 0, 2] = -w[:, 2], w[:, 1]
        wx[:, 1, 0], wx[:, 1, 2] = w[:, 2], -w[:, 0]
        wx[:, 2, 0], wx[:, 2, 1] = -w[:, 1], w[:, 0]
        theta = w.norm(dim=-1)[..., None, None]

        def taylor(x, kind, nth=10):
            ans = torch.zeros_like(x)
            denom = 1.0
            for i in range(nth + 1):
                if kind == "A":
                    if i > 0:
                        denom *= (2 * i) * (2 * i + 1)
                elif kind == "B":
                    denom *= (2 * i + 1) * (2 * i + 2)
                else:
                    denom *= (2 * i + 2) * (2 * i + 3)
                ans = ans + (-1) ** i * x ** (2 * i) / denom
            return ans

        eye = torch.eye(3)
        A, B, C = taylor(theta, "A"), taylor(theta, "B"), taylor(theta, "C")
        R = eye + A * wx + B * wx @ wx
        V = eye + B * wx + C * wx @ wx
        Rt_ref = torch.cat([R, V @ u[..., None]], dim=-1)

        Rt = lie.se3_to_SE3(jnp.asarray(wu))
        np.testing.assert_allclose(np.asarray(Rt), Rt_ref.numpy(), atol=1e-5)
