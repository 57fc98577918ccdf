"""VGG multi-layer feature extraction (weights-gated) for perceptual losses.

Role of `lib/vgg_loss.py` (`VGGLoss.get_multi_features`) feeding
`data_dict['vgg_features']` for the surface-feature agreement loss
(`recon_scene.py:371-439`, `eval.py:308-309`). Uses the same VGG16 conv stack
as the LPIPS metric; weights come from $POSEPROBE_LPIPS_WEIGHTS (zero-egress
environments must provide them locally). Falls back to cheap image-pyramid
gradient features so the loss stays usable without pretrained weights.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def features_available() -> bool:
    from .metrics import lpips_available
    return lpips_available()


def get_multi_features(images: np.ndarray, layers: int = 2) -> np.ndarray:
    """images [B, H, W, 3] -> feature maps [B, H, W, C] (resampled to input res).

    With VGG weights: concatenated early conv blocks. Without: normalized
    color + Sobel-gradient channels (still a meaningful matching signal).
    """
    images = jnp.asarray(images, jnp.float32)
    if features_available():
        from .metrics import _VGG_SLICES
        blobs = np.load(os.environ["POSEPROBE_LPIPS_WEIGHTS"])

        def conv(x, w, b):
            out = jax.lax.conv_general_dilated(
                x.transpose(0, 3, 1, 2), jnp.asarray(w), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return (out + jnp.asarray(b)[None, :, None, None]).transpose(0, 2, 3, 1)

        feats = []
        h = images * 2.0 - 1.0
        for si, slice_ids in enumerate(_VGG_SLICES[:layers]):
            for li in slice_ids:
                h = jax.nn.relu(conv(h, blobs[f"features.{li}.weight"], blobs[f"features.{li}.bias"]))
            feats.append(h)
            if si < layers - 1:
                B, H, W, C = h.shape
                h = h[:, : H // 2 * 2, : W // 2 * 2].reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
        # upsample all to input resolution and concat
        H, W = images.shape[1:3]
        ups = []
        for f in feats:
            if f.shape[1] != H:
                f = jax.image.resize(f, (f.shape[0], H, W, f.shape[-1]), "bilinear")
            ups.append(f)
        return np.asarray(jnp.concatenate(ups, axis=-1))

    # fallback: color + gradient channels
    gray = images @ jnp.asarray([0.299, 0.587, 0.114])
    gx = jnp.zeros_like(gray).at[:, :, 1:-1].set((gray[:, :, 2:] - gray[:, :, :-2]) / 2)
    gy = jnp.zeros_like(gray).at[:, 1:-1].set((gray[:, 2:] - gray[:, :-2]) / 2)
    return np.asarray(jnp.concatenate([images, gx[..., None], gy[..., None]], axis=-1))
