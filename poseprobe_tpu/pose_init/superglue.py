"""SuperPoint + SuperGlue in JAX (weights loaded from torch checkpoints).

Architecture parity with the vendored reference models
(`external/SuperGlue/models/superpoint.py`, `superglue.py`):

* SuperPoint: shared VGG-style encoder (4 conv blocks with max-pools),
  a 65-channel detector head (softmax over 8x8 cells + dustbin, depth-to-
  space), and a 256-d descriptor head sampled bilinearly at keypoints.
* SuperGlue: keypoint-position MLP encoder, L=9 alternating self/cross
  multi-head (4) attention layers over both keypoint sets, final projection,
  and Sinkhorn optimal transport with a learned dustbin score.

The official pretrained weights are git-LFS blobs absent from the reference
snapshot and not downloadable here (zero egress); provide them locally as the
torch .pth files via $POSEPROBE_SUPERGLUE_WEIGHTS (a directory containing
``superpoint_v1.pth`` and ``superglue_{indoor,outdoor}.pth``). Until then,
`pose_init.matching` falls back to the classical matcher.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .matching import SUPERGLUE_WEIGHTS_ENV, _grayscale_u8

# ----------------------------------------------------------------- SuperPoint

SP_CHANNELS = (64, 64, 64, 64, 128, 128, 128, 128)


def _conv(x, w, b, stride=1, padding="SAME"):
    """x [H, W, C]; torch weight [out, in, kh, kw]."""
    out = jax.lax.conv_general_dilated(
        x[None].transpose(0, 3, 1, 2), jnp.asarray(w), (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return (out[0] + jnp.asarray(b)[:, None, None]).transpose(1, 2, 0)


def _maxpool2(x):
    H, W = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
    return x[:H, :W].reshape(H // 2, 2, W // 2, 2, -1).max(axis=(1, 3))


def superpoint_forward(weights: dict, image_gray: jnp.ndarray,
                       nms_radius: int = 2, keypoint_threshold: float = 0.0,
                       max_keypoints: int = 512):
    """image_gray [H, W] in [0, 1] -> (keypoints [K, 2], scores [K], desc [K, 256]).

    Outputs are fixed-size (top-K, zero-padded with score 0).
    """
    x = image_gray[..., None]
    relu = jax.nn.relu
    # encoder: conv1a/1b pool conv2a/2b pool conv3a/3b pool conv4a/4b
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b"]
    for i, n in enumerate(names):
        x = relu(_conv(x, weights[f"{n}.weight"], weights[f"{n}.bias"]))
        if n in ("conv1b", "conv2b", "conv3b"):
            x = _maxpool2(x)
    # detector head
    cpa = relu(_conv(x, weights["convPa.weight"], weights["convPa.bias"]))
    scores = _conv(cpa, weights["convPb.weight"], weights["convPb.bias"])  # [h, w, 65]
    scores = jax.nn.softmax(scores, axis=-1)[..., :64]
    h, w = scores.shape[:2]
    # depth-to-space 8x8
    heat = scores.reshape(h, w, 8, 8).transpose(0, 2, 1, 3).reshape(h * 8, w * 8)
    # iterative NMS (`simple_nms`, superpoint.py:47-62): two suppression
    # rounds that re-admit maxima outside already-suppressed neighborhoods
    k = 2 * nms_radius + 1
    maxpool = lambda x: jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    max_mask = heat == maxpool(heat)
    for _ in range(2):
        supp_mask = maxpool(max_mask.astype(heat.dtype)) > 0
        supp_scores = jnp.where(supp_mask, 0.0, heat)
        new_max_mask = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    heat = jnp.where(max_mask, heat, 0.0)
    heat = jnp.where(heat > keypoint_threshold, heat, 0.0)
    # remove border
    b = 4
    mask = jnp.zeros_like(heat).at[b:-b, b:-b].set(1.0)
    heat = heat * mask
    flat = heat.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    ky = (top_idx // heat.shape[1]).astype(jnp.float32)
    kx = (top_idx % heat.shape[1]).astype(jnp.float32)
    keypoints = jnp.stack([kx, ky], -1)
    # descriptor head
    cda = relu(_conv(x, weights["convDa.weight"], weights["convDa.bias"]))
    desc_map = _conv(cda, weights["convDb.weight"], weights["convDb.bias"])  # [h, w, 256]
    desc_map = desc_map / (jnp.linalg.norm(desc_map, axis=-1, keepdims=True) + 1e-8)
    # bilinear sample at keypoints (descriptor grid is 1/8 resolution);
    # exact `sample_descriptors` coordinates (superpoint.py:80-93):
    # align_corners grid_sample of u = (k - s/2 + 0.5)/(dim*s - s/2 - 0.5)
    from ..core.geometry import bilinear_image_sample
    s = 8.0
    hd, wd = desc_map.shape[:2]
    u = (keypoints[:, 0] - s / 2 + 0.5) / (wd * s - s / 2 - 0.5) * (wd - 1)
    v = (keypoints[:, 1] - s / 2 + 0.5) / (hd * s - s / 2 - 0.5) * (hd - 1)
    desc_pts = jnp.stack([u, v], -1)
    desc = bilinear_image_sample(desc_map, desc_pts)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return keypoints, top_scores, desc


# ------------------------------------------------------------------ SuperGlue

def _mlp_ln(weights: dict, prefix: str, x: jnp.ndarray, layer_ids) -> jnp.ndarray:
    """Conv1d(+BN folded? reference uses BN inside MLP) stack over [N, C]."""
    for i, lid in enumerate(layer_ids):
        w = jnp.asarray(weights[f"{prefix}.{lid}.weight"])[:, :, 0]  # [out, in]
        b = jnp.asarray(weights[f"{prefix}.{lid}.bias"])
        x = x @ w.T + b
        bn_w = weights.get(f"{prefix}.{lid + 1}.weight")
        if bn_w is not None and i < len(layer_ids) - 1:
            mean = jnp.asarray(weights[f"{prefix}.{lid + 1}.running_mean"])
            var = jnp.asarray(weights[f"{prefix}.{lid + 1}.running_var"])
            gamma = jnp.asarray(bn_w)
            beta = jnp.asarray(weights[f"{prefix}.{lid + 1}.bias"])
            x = (x - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
        if i < len(layer_ids) - 1:
            x = jax.nn.relu(x)
    return x


def _attention(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum("hnd,hmd->hnm", q, k) / d**0.5
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hnm,hmd->hnd", attn, v)


def _attn_layer(weights: dict, prefix: str, x: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """One attentional aggregation layer (superglue.py AttentionalPropagation)."""
    D, H = 256, 4
    # torch splits the channel axis as (dim, heads): head h reads the strided
    # channels d*H + h (`MultiHeadedAttention.forward`, superglue.py:167-172)
    def proj(name, inp):
        w = jnp.asarray(weights[f"{prefix}.attn.proj.{name}.weight"])[:, :, 0]
        b = jnp.asarray(weights[f"{prefix}.attn.proj.{name}.bias"])
        out = inp @ w.T + b
        return out.reshape(-1, D // H, H).transpose(2, 0, 1)  # [H, N, 64]

    q = proj("0", x)
    k = proj("1", source)
    v = proj("2", source)
    # merge input channel order is again d*H + h (x.view(b, dim*heads, n))
    msg = _attention(q, k, v).transpose(1, 2, 0).reshape(-1, D)
    w_m = jnp.asarray(weights[f"{prefix}.attn.merge.weight"])[:, :, 0]
    b_m = jnp.asarray(weights[f"{prefix}.attn.merge.bias"])
    msg = msg @ w_m.T + b_m
    # MLP over [x || msg]
    y = _mlp_ln(weights, f"{prefix}.mlp", jnp.concatenate([x, msg], -1), (0, 3))
    return x + y


def _log_sinkhorn(scores: jnp.ndarray, alpha: float, iters: int) -> jnp.ndarray:
    """Log-domain Sinkhorn with dustbins (superglue.py:150-204)."""
    m, n = scores.shape
    bins0 = jnp.full((m, 1), alpha)
    bins1 = jnp.full((1, n), alpha)
    bins2 = jnp.full((1, 1), alpha)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], -1),
         jnp.concatenate([bins1, bins2], -1)], 0)  # [m+1, n+1]
    norm = -jnp.log(jnp.asarray(m + n, jnp.float32))
    log_mu = jnp.concatenate([jnp.full(m, norm), jnp.array([np.log(n) + norm])])
    log_nu = jnp.concatenate([jnp.full(n, norm), jnp.array([np.log(m) + norm])])
    u, v = jnp.zeros(m + 1), jnp.zeros(n + 1)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    return couplings + u[:, None] + v[None, :] - norm


def superglue_forward(weights: dict, kpts0, scores0, desc0, kpts1, scores1, desc1,
                      image_shape, sinkhorn_iterations: int = 20,
                      match_threshold: float = 0.2):
    """Match two keypoint sets. Returns (matches0 [N], mscores0 [N])."""
    H, W = image_shape
    # normalize keypoints (superglue.py normalize_keypoints)
    center = jnp.array([W / 2.0, H / 2.0])
    scaling = 0.7 * max(H, W)
    def enc(kpts, scores, desc):
        nk = (kpts - center) / scaling
        inp = jnp.concatenate([nk, scores[:, None]], -1)  # [N, 3]
        kenc = _mlp_ln(weights, "kenc.encoder", inp, (0, 3, 6, 9, 12))
        return desc + kenc

    x0 = enc(kpts0, scores0, desc0)
    x1 = enc(kpts1, scores1, desc1)
    # alternating self/cross GNN (9 x 2 layers: names 'self','cross' repeated)
    layer_types = ["self", "cross"] * 9
    for i, t in enumerate(layer_types):
        prefix = f"gnn.layers.{i}"
        if t == "self":
            x0 = _attn_layer(weights, prefix, x0, x0)
            x1 = _attn_layer(weights, prefix, x1, x1)
        else:
            x0n = _attn_layer(weights, prefix, x0, x1)
            x1 = _attn_layer(weights, prefix, x1, x0)
            x0 = x0n
    wf = jnp.asarray(weights["final_proj.weight"])[:, :, 0]
    bf = jnp.asarray(weights["final_proj.bias"])
    m0 = x0 @ wf.T + bf
    m1 = x1 @ wf.T + bf
    scores = jnp.einsum("nd,md->nm", m0, m1) / 256.0**0.5
    Z = _log_sinkhorn(scores, float(np.asarray(weights["bin_score"])), sinkhorn_iterations)
    Z = Z[:-1, :-1]
    max0 = Z.max(axis=1)
    idx0 = Z.argmax(axis=1)
    idx1 = Z.argmax(axis=0)
    mutual = jnp.arange(Z.shape[0]) == idx1[idx0]
    mscores = jnp.where(mutual, jnp.exp(max0), 0.0)
    valid = mutual & (mscores > match_threshold)
    matches0 = jnp.where(valid, idx0, -1)
    return matches0, mscores


# ------------------------------------------------------------------- frontend

_CACHE: dict = {}


def _read_checkpoint(path: str) -> dict:
    """Read a weights file: converted ``.npz`` (torch-free, preferred — see
    `pose_init.convert`) or a raw torch ``.pth`` state_dict."""
    if path.endswith(".npz"):
        from .convert import load_npz

        return load_npz(path)
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v) for k, v in sd.items()}


def _find(root: str, stem: str) -> str | None:
    for ext in (".npz", ".pth"):
        p = os.path.join(root, stem + ext)
        if os.path.exists(p):
            return p
    return None


def _load_weights():
    root = os.environ[SUPERGLUE_WEIGHTS_ENV]
    if "sp" not in _CACHE:
        sp_path = (_find(root, "superpoint_v1") or "") if os.path.isdir(root) else root
        _CACHE["sp"] = _read_checkpoint(sp_path)
        if os.path.isdir(root):
            for name in ("indoor", "outdoor"):
                p = _find(root, f"superglue_{name}")
                if p:
                    _CACHE[f"sg_{name}"] = _read_checkpoint(p)
    return _CACHE


def match_pair_superglue(img_i: np.ndarray, img_j: np.ndarray, mask_j,
                         max_matcher: int = 256, variant: str = "indoor",
                         match_threshold: float = 0.2) -> np.ndarray:
    """Full SuperPoint+SuperGlue pass; returns the padded [max_matcher, 5] pack.

    Mirrors `matching_pair` (`lib/utils_vis.py:358-403`): image0 slot = paired
    view j, keypoints masked by view j's object mask, columns
    (x_j, y_j, x_i, y_i, conf).
    """
    cache = _load_weights()
    sp = cache["sp"]
    sg = cache.get(f"sg_{variant}") or next(v for k, v in cache.items() if k.startswith("sg"))

    g_i = jnp.asarray(_grayscale_u8(img_i), jnp.float32) / 255.0
    g_j = jnp.asarray(_grayscale_u8(img_j), jnp.float32) / 255.0
    k_j, s_j, d_j = superpoint_forward(sp, g_j)
    k_i, s_i, d_i = superpoint_forward(sp, g_i)
    matches0, mscores = superglue_forward(sg, k_j, s_j, d_j, k_i, s_i, d_i,
                                          g_j.shape, match_threshold=match_threshold)
    matches0 = np.asarray(matches0)
    mscores = np.asarray(mscores)
    k_j = np.asarray(k_j)
    k_i = np.asarray(k_i)
    valid = matches0 > -1
    if mask_j is not None:
        mj = np.asarray(mask_j).squeeze()
        ys = np.clip(k_j[:, 1].astype(int), 0, mj.shape[0] - 1)
        xs = np.clip(k_j[:, 0].astype(int), 0, mj.shape[1] - 1)
        valid &= mj[ys, xs] > 0
    pack = np.zeros((max_matcher, 5), np.float32)
    sel = np.where(valid)[0]
    order = np.argsort(-mscores[sel])
    sel = sel[order][:max_matcher]
    m = len(sel)
    pack[:m, 0:2] = k_j[sel]
    pack[:m, 2:4] = k_i[matches0[sel]]
    pack[:m, 4] = mscores[sel]
    return pack
