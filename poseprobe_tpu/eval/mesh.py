"""Mesh extraction + chamfer evaluation, backed by the native C++ library.

Replaces the reference's mcubes/trimesh/sklearn stack (`lib/dvgo_ori.py:695-703`,
`lib/dtu_eval.py:37-100`, `recon_scene.py:846-875`). The C++ core
(`poseprobe_tpu/native/mesh_native.cpp`) is compiled on first use with g++ and
loaded via ctypes; scipy's cKDTree is the fallback for chamfer and a
vectorized-numpy marching tetrahedra the fallback for meshing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmesh_native.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "mesh_native.cpp"))
_lib: Optional[ctypes.CDLL] = None


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
            subprocess.run(
                ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.marching_tetrahedra.restype = ctypes.c_int
        lib.marching_tetrahedra.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nearest_neighbor_sqdist.restype = None
        lib.nearest_neighbor_sqdist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def marching_cubes(volume: np.ndarray, iso: float = 0.0):
    """Extract the iso-surface of volume [X, Y, Z]. Returns (verts [V, 3] in
    index space, tris [T, 3] int32). Uses the native marching tetrahedra."""
    volume = np.ascontiguousarray(volume, np.float32)
    lib = _load_native()
    if lib is not None:
        nx, ny, nz = volume.shape
        max_tris = int(nx * ny * nz * 12)
        verts = np.empty((max_tris * 3, 3), np.float32)
        tris = np.empty((max_tris, 3), np.int32)
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        lib.marching_tetrahedra(
            _fptr(volume), nx, ny, nz, ctypes.c_float(iso),
            _fptr(verts), tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            verts.shape[0], max_tris, ctypes.byref(nv), ctypes.byref(nt))
        return verts[: nv.value].copy(), tris[: nt.value].copy()
    return _marching_tetrahedra_numpy(volume, iso)


def extract_mesh_world(volume: np.ndarray, xyz_min, xyz_max, iso: float = 0.0,
                       scale_mat: np.ndarray | None = None):
    """Marching cubes + index->world transform (+ optional DTU scale_mat),
    mirroring `validate_deform_mesh` (`recon_scene.py:846-875`)."""
    verts, tris = marching_cubes(volume, iso)
    res = np.asarray(volume.shape, np.float32) - 1.0
    xyz_min = np.asarray(xyz_min, np.float32)
    xyz_max = np.asarray(xyz_max, np.float32)
    verts_w = xyz_min + verts / np.maximum(res, 1) * (xyz_max - xyz_min)
    if scale_mat is not None:
        verts_w = verts_w * scale_mat[0, 0] + scale_mat[:3, 3][None]
    return verts_w, tris


def filter_small_components(verts: np.ndarray, tris: np.ndarray,
                            min_area_frac: float = 0.05):
    """Drop mesh components whose surface area < min_area_frac x the
    largest component's area.

    Standard mesh-eval hygiene (the official DTU evaluation scores a
    cleaned reconstruction; MeshLab/open3d pipelines do the same): a noisy
    far-field SDF region produces salt-noise junk shells all over the
    bbox whose surface area can dwarf the actual object's, swamping both
    d2s and the observation-mask culls (round-5 journal: an 0.068-frac_neg
    probe grid extracted 806k verts spanning the whole box; the junk drove
    pred_culled_frac to ~1.0 and d2s to 0.15).

    Returns (verts, tris, info) with vertices re-indexed; info reports the
    kept fraction so the filtering is visible in committed artifacts.
    """
    if len(tris) == 0:
        return verts, tris, {"components": 0, "kept_area_frac": 1.0}
    # WELD first: the native marching-tetrahedra extractor emits per-triangle
    # vertices (no sharing), so connectivity would see every triangle as its
    # own component (observed: 1.08M "components" for a 1.08M-tri mesh).
    # Quantize to ~1e-6 of the bbox diagonal and merge identical positions.
    diag = float(np.linalg.norm(verts.max(0) - verts.min(0))) or 1.0
    q = np.round(verts / (diag * 1e-6)).astype(np.int64)
    _, first_idx, inv = np.unique(q, axis=0, return_index=True,
                                  return_inverse=True)
    verts = verts[first_idx]
    tris = inv[tris]
    # drop degenerate triangles produced by the weld
    ok = ((tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2])
          & (tris[:, 0] != tris[:, 2]))
    tris = tris[ok]
    if len(tris) == 0:
        return verts, tris, {"components": 0, "kept_area_frac": 1.0}
    try:  # vectorized path (scipy is available in this environment)
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        rows = np.concatenate([tris[:, 0], tris[:, 1], tris[:, 2]])
        cols = np.concatenate([tris[:, 1], tris[:, 2], tris[:, 0]])
        adj = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                         shape=(len(verts), len(verts)))
        _, roots = connected_components(adj, directed=False)
    except Exception:  # pragma: no cover - pure-python union-find fallback
        parent = np.arange(len(verts))

        def find(a):
            root = a
            while parent[root] != root:
                root = parent[root]
            while parent[a] != root:
                parent[a], a = root, parent[a]
            return root

        for t in tris:
            ra, rb, rc = find(t[0]), find(t[1]), find(t[2])
            parent[rb] = ra
            parent[rc] = ra
        roots = np.array([find(v) for v in range(len(verts))])

    e1 = verts[tris[:, 1]] - verts[tris[:, 0]]
    e2 = verts[tris[:, 2]] - verts[tris[:, 0]]
    tri_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    tri_root = roots[tris[:, 0]]
    comp_ids, comp_idx = np.unique(tri_root, return_inverse=True)
    comp_area = np.zeros(len(comp_ids))
    np.add.at(comp_area, comp_idx, tri_area)
    keep_comp = comp_area >= min_area_frac * comp_area.max()
    keep_tri = keep_comp[comp_idx]
    kept_area = float(comp_area[keep_comp].sum() / comp_area.sum())
    new_tris = tris[keep_tri]
    used = np.unique(new_tris)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    info = {"components": int(len(comp_ids)),
            "components_kept": int(keep_comp.sum()),
            "kept_area_frac": kept_area}
    return verts[used], remap[new_tris], info


def save_ply(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Minimal binary-less PLY writer (replaces trimesh.export)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def nearest_sqdist(query: np.ndarray, ref: np.ndarray, cell_size: float | None = None) -> np.ndarray:
    """Per-query squared distance to nearest ref point."""
    query = np.ascontiguousarray(query, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    lib = _load_native()
    if lib is not None and len(ref) > 0:
        if cell_size is None:
            bbox = ref.max(0) - ref.min(0)
            cell_size = float(max(bbox.max(), 1e-6)) / max(int(len(ref) ** (1 / 3)), 1)
        out = np.empty(len(query), np.float32)
        lib.nearest_neighbor_sqdist(_fptr(query), len(query), _fptr(ref), len(ref),
                                    ctypes.c_float(cell_size), _fptr(out))
        return out
    from scipy.spatial import cKDTree
    d, _ = cKDTree(ref).query(query, k=1)
    return (d**2).astype(np.float32)


def chamfer_distance(pts_a: np.ndarray, pts_b: np.ndarray,
                     max_dist: float | None = None):
    """Symmetric chamfer (mean of clipped NN distances both ways), like the DTU
    d2s/s2d protocol (`lib/dtu_eval.py`). Returns (a2b, b2a, overall)."""
    d_ab = np.sqrt(nearest_sqdist(pts_a, pts_b))
    d_ba = np.sqrt(nearest_sqdist(pts_b, pts_a))
    if max_dist is not None:
        d_ab = np.minimum(d_ab, max_dist)
        d_ba = np.minimum(d_ba, max_dist)
    return float(d_ab.mean()), float(d_ba.mean()), float((d_ab.mean() + d_ba.mean()) / 2)


def sample_mesh_surface(verts: np.ndarray, tris: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    """Uniform area-weighted surface sampling (for chamfer).

    An empty mesh (degenerate SDF with no zero crossing — see eval.py's
    empty-mesh diagnostics) yields an empty [0, 3] sample set rather than an
    index error, so callers can score it as a failure."""
    if len(verts) == 0 or len(tris) == 0:
        return np.zeros((0, 3), dtype=np.float64)
    rng = np.random.default_rng(seed)
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    if area.sum() <= 0:
        return verts[rng.integers(0, max(len(verts), 1), n)]
    probs = area / area.sum()
    idx = rng.choice(len(tris), size=n, p=probs)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return v0[idx] + u * (v1[idx] - v0[idx]) + v * (v2[idx] - v0[idx])


def _marching_tetrahedra_numpy(volume: np.ndarray, iso: float):
    """Vectorized numpy fallback (slower, same surface)."""
    # evaluate per-cube sign pattern; delegate per-crossing-cube to a small loop
    inside = volume >= iso
    cross = np.zeros(tuple(s - 1 for s in volume.shape), bool)
    acc = np.zeros_like(cross, np.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                acc += inside[dx:dx + cross.shape[0], dy:dy + cross.shape[1], dz:dz + cross.shape[2]]
    cross = (acc > 0) & (acc < 8)
    verts_out, tris_out = [], []
    tets = [(0, 5, 1, 3), (0, 5, 3, 6), (0, 6, 3, 2), (0, 6, 2, 4), (5, 6, 0, 4), (5, 6, 4, 7)]
    corners = [(c & 1, (c >> 1) & 1, (c >> 2) & 1) for c in range(8)]
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for x, y, z in zip(*np.where(cross)):
        cp = [np.array([x + c[0], y + c[1], z + c[2]], np.float32) for c in corners]
        cv = [volume[x + c[0], y + c[1], z + c[2]] for c in corners]
        for tet in tets:
            pts = []
            for a, b in edges:
                ia, ib = tet[a], tet[b]
                sa, sb = cv[ia] >= iso, cv[ib] >= iso
                if sa != sb:
                    t = (iso - cv[ia]) / (cv[ib] - cv[ia] + 1e-12)
                    pts.append(cp[ia] + np.clip(t, 0, 1) * (cp[ib] - cp[ia]))
            base = len(verts_out)
            if len(pts) == 3:
                verts_out += pts
                tris_out.append([base, base + 1, base + 2])
            elif len(pts) == 4:
                verts_out += pts
                tris_out.append([base, base + 1, base + 2])
                tris_out.append([base + 1, base + 3, base + 2])
    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return np.asarray(verts_out, np.float32), np.asarray(tris_out, np.int32)
