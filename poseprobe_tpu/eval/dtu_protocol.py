"""DTU mesh evaluation protocol: masked, culled chamfer against GT points.

Rebuilds `lib/dtu_eval.py` (eval function `:37-100+`): sample points from the
predicted mesh, cull both sets to the observation bounding box, compute
clipped d2s (data-to-stl) and s2d (stl-to-data) distances with the standard
`max_dist=20` (mm) truncation, report their means and the overall average.
The sklearn-KDTree + multiprocessing pipeline becomes the native C++
grid-hash NN (`poseprobe_tpu/native/mesh_native.cpp`).
"""
from __future__ import annotations

import numpy as np

from . import mesh as mesh_mod

MAX_DIST = 20.0       # mm truncation (dtu_eval.py)
DOWNSAMPLE = 0.2      # point spacing for mesh surface sampling (mm)


def load_stl_points(path: str, max_points: int = 2_000_000) -> np.ndarray:
    """Load GT points from the DTU `stl_total.ply` (ascii or binary-le floats)."""
    verts = []
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            line = f.readline()
            header += line
        text = header.decode("ascii", "ignore")
        n_verts = int([l for l in text.splitlines() if l.startswith("element vertex")][0].split()[-1])
        binary = "binary" in text
        n_props = len([l for l in text.splitlines() if l.startswith("property") and "list" not in l])
        if binary:
            data = np.fromfile(f, dtype="<f4", count=n_verts * n_props).reshape(n_verts, n_props)
            verts = data[:, :3]
        else:
            rows = [f.readline().split()[:3] for _ in range(n_verts)]
            verts = np.asarray(rows, np.float32)
    verts = np.asarray(verts, np.float32)
    if len(verts) > max_points:
        sel = np.random.default_rng(0).choice(len(verts), max_points, replace=False)
        verts = verts[sel]
    return verts


def evaluate_mesh_dtu(pred_verts: np.ndarray, pred_tris: np.ndarray,
                      gt_points: np.ndarray, bbox: np.ndarray | None = None,
                      n_samples: int = 500_000, max_dist: float = MAX_DIST):
    """Returns dict(d2s, s2d, overall) in GT units (mm for DTU)."""
    pred_pts = mesh_mod.sample_mesh_surface(pred_verts, pred_tris, n_samples)
    if bbox is not None:
        lo, hi = bbox[0], bbox[1]
        keep_p = np.all((pred_pts >= lo) & (pred_pts <= hi), axis=1)
        keep_g = np.all((gt_points >= lo) & (gt_points <= hi), axis=1)
        pred_pts = pred_pts[keep_p] if keep_p.any() else pred_pts
        gt_points = gt_points[keep_g] if keep_g.any() else gt_points
    d2s = np.sqrt(mesh_mod.nearest_sqdist(pred_pts, gt_points))
    s2d = np.sqrt(mesh_mod.nearest_sqdist(gt_points, pred_pts))
    d2s = np.minimum(d2s, max_dist)
    s2d = np.minimum(s2d, max_dist)
    return {
        "d2s": float(d2s.mean()),
        "s2d": float(s2d.mean()),
        "overall": float((d2s.mean() + s2d.mean()) / 2),
    }
