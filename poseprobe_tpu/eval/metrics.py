"""Image quality metrics: PSNR, SSIM, LPIPS (weights-gated).

Reference counterparts: `utils.py:47` (PSNR), `rgb_ssim` (`lib/utils.py:792-835`,
the numpy SSIM with 11x11 Gaussian window), `rgb_lpips` via the lpips package
(`lib/utils.py:838-856`). LPIPS requires pretrained VGG/AlexNet weights that
cannot be downloaded here; `lpips_fn` loads them from a local .npz when
available and raises a clear error otherwise (metrics are off the hot path).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def depth_abs_rmse(pred, gt, valid=None, scale: float = 1.0):
    """Depth abs error + RMSE on valid GT pixels (host numpy).

    Mirrors `compute_depth_error_on_rays`/`compute_rmse`
    (`lib/bg_nerf/source/training/core/metrics.py:78-134`): the predicted
    depth is multiplied by the sim3 est->GT scale (the optimized geometry is
    valid up to a similarity, `renderer.py:202-209`), invalid GT (0) pixels
    are dropped. Returns (abs_e, rmse) floats; (nan, nan) if nothing valid.
    """
    pred = np.asarray(pred, np.float64).reshape(-1) * float(scale)
    gt = np.asarray(gt, np.float64).reshape(-1)
    v = (gt > 0) if valid is None else np.asarray(valid).reshape(-1).astype(bool)
    if not v.any():
        return float("nan"), float("nan")
    diff = gt[v] - pred[v]
    return float(np.abs(diff).mean()), float(np.sqrt((diff ** 2).mean()))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(img0: jnp.ndarray, img1: jnp.ndarray, max_val: float = 1.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """SSIM over [H, W, C] images, matching `rgb_ssim` (`lib/utils.py:792-835`)."""
    w = _gaussian_window(filter_size, filter_sigma)

    def filt(x):  # x: [H, W]
        return jax.scipy.signal.convolve2d(x, w, mode="valid")

    def per_channel(a, b):
        mu0, mu1 = filt(a), filt(b)
        s00 = filt(a * a) - mu0**2
        s11 = filt(b * b) - mu1**2
        s01 = filt(a * b) - mu0 * mu1
        c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
        s00, s11 = jnp.maximum(s00, 0), jnp.maximum(s11, 0)
        num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
        den = (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
        return (num / den).mean()

    vals = [per_channel(img0[..., c], img1[..., c]) for c in range(img0.shape[-1])]
    return jnp.mean(jnp.asarray(vals))


_LPIPS_WEIGHTS_ENV = "POSEPROBE_LPIPS_WEIGHTS"


class LPIPSUnavailable(RuntimeError):
    pass


def lpips_available() -> bool:
    path = os.environ.get(_LPIPS_WEIGHTS_ENV, "")
    return bool(path) and os.path.exists(path)


def lpips_fn(img0: jnp.ndarray, img1: jnp.ndarray) -> float:
    """LPIPS(vgg-lin) from locally provided weights.

    Expects a .npz at $POSEPROBE_LPIPS_WEIGHTS containing VGG16 conv weights
    (`features.N.weight/bias`) and the LPIPS linear layer weights
    (`lin{i}.model.1.weight`). In this zero-egress environment the weights
    cannot be fetched, so evaluation falls back to PSNR/SSIM when absent.
    """
    if not lpips_available():
        raise LPIPSUnavailable(
            f"LPIPS weights not found; set ${_LPIPS_WEIGHTS_ENV} to a local .npz")
    blobs = np.load(os.environ[_LPIPS_WEIGHTS_ENV])
    return float(_lpips_vgg(jnp.asarray(img0), jnp.asarray(img1), blobs))


_VGG_SLICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_IMAGENET_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_STD = np.array([0.458, 0.448, 0.450], np.float32)


def _lpips_vgg(img0, img1, blobs) -> jnp.ndarray:
    """Minimal VGG16-lin LPIPS forward (images [H, W, 3] in [0, 1])."""

    def normalize(x):
        x = x * 2.0 - 1.0
        return (x - _IMAGENET_MEAN) / _IMAGENET_STD

    def conv(x, w, b):
        # torch conv weight [out, in, kh, kw] -> HWC conv
        out = jax.lax.conv_general_dilated(
            x[None].transpose(0, 3, 1, 2), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return (out[0] + jnp.asarray(b)[:, None, None]).transpose(1, 2, 0)

    def features(x):
        feats = []
        h = x
        for si, slice_ids in enumerate(_VGG_SLICES):
            for li in slice_ids:
                h = conv(h, blobs[f"features.{li}.weight"], blobs[f"features.{li}.bias"])
                h = jax.nn.relu(h)
            feats.append(h)
            if si < len(_VGG_SLICES) - 1:
                H2, W2 = h.shape[0] // 2, h.shape[1] // 2
                h = h[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2, -1).max(axis=(1, 3))
        return feats

    f0 = features(normalize(img0))
    f1 = features(normalize(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = jnp.asarray(blobs[f"lin{i}.model.1.weight"])[:, :, 0, 0]  # [1, C]
        total = total + (diff @ lin[0]).mean()
    return total
