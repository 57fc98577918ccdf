"""Training state pytree + self-describing checkpoints.

The two reference checkpoint families (`last_ckpt.tar` object state,
`model_last/best.pth.tar` scene state; see `lib/recon_scene.py:779-791`,
`renderer.py:1028-1051`) collapse into one atomic checkpoint of the full
TrainState pytree plus the static configs — the checkpoint is
self-describing like the reference's saved `model_kwargs`.

Format v2 (round-4 hardening): a single ``.npz`` archive — every pytree leaf
a named array entry, plus a ``__manifest__`` JSON member recording the
format version, per-leaf keypaths/dtypes/shapes, scalar fields, configs, and
optional host-side extras (loop RNG key, maskcache) so a killed run resumes
with bit-identical training. No pickle on the write path (a pickle
checkpoint is unauditable and breaks across refactors); v1 pickle
checkpoints from earlier rounds still load read-only.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
import zipfile
from typing import Any

import jax
import numpy as np

CKPT_VERSION = 2
_SECTIONS = ("obj_params", "scene_params", "pose_params",
             "opt_obj", "opt_scene", "opt_pose")


@dataclasses.dataclass
class TrainState:
    obj_params: Any
    scene_params: Any
    pose_params: Any
    opt_obj: Any
    opt_scene: Any
    opt_pose: Any
    poses_pnp: Any          # [n_train, 3, 4] host-updated PnP anchors
    step: int = 0
    n_active: int = 2
    best_val: float = -1.0


def _flatten_with_paths(tree):
    lw, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return ([jax.tree_util.keystr(kp) for kp, _ in lw],
            [v for _, v in lw], treedef)


def save_checkpoint(path: str, state: TrainState, configs: dict | None = None,
                    extras: dict | None = None) -> None:
    """Atomic write (tmp + rename), like orbax's atomicity guarantee.

    `extras`: optional host-side arrays (e.g. the trainer's loop RNG key and
    maskcache) keyed by name; restored via `get_extras`.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    manifest: dict = {
        "format": "poseprobe_ckpt", "version": CKPT_VERSION,
        "sections": {}, "extras": [],
        "scalars": {"step": int(state.step), "n_active": int(state.n_active),
                    "best_val": float(state.best_val)},
        "configs": json.loads(json.dumps(configs or {}, default=str)),
    }
    for sec in _SECTIONS:
        paths, leaves, _ = _flatten_with_paths(getattr(state, sec))
        entries = []
        for i, (p, leaf) in enumerate(zip(paths, leaves)):
            arr = np.asarray(leaf)
            if arr.dtype == object:
                raise TypeError(f"{sec}{p}: non-numeric leaf {type(leaf)}")
            key = f"{sec}.{i:05d}"
            arrays[key] = arr
            entries.append({"path": p, "key": key, "dtype": str(arr.dtype),
                            "shape": list(arr.shape)})
        manifest["sections"][sec] = entries
    arrays["poses_pnp"] = np.asarray(state.poses_pnp)
    for name, val in (extras or {}).items():
        if val is None:
            continue
        arrays[f"extra.{name}"] = np.asarray(val)
        manifest["extras"].append(name)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    if configs is not None:  # human-readable sidecar (unchanged contract)
        with open(path + ".json", "w") as f:
            json.dump(configs, f, indent=2, default=str)


def load_checkpoint(path: str) -> dict:
    """Load v2 (npz) or legacy v1 (pickle) checkpoints.

    Returns a payload dict; pass it to `restore_state` / `get_extras`.
    """
    if zipfile.is_zipfile(path):
        z = np.load(path, allow_pickle=False)
        manifest = json.loads(bytes(z["__manifest__"].tobytes()).decode("utf-8"))
        if manifest.get("version", 0) > CKPT_VERSION:
            raise ValueError(
                f"checkpoint {path} has version {manifest['version']} > "
                f"supported {CKPT_VERSION}")
        return {"version": manifest["version"], "npz": z, "manifest": manifest}
    with open(path, "rb") as f:  # legacy round-1..3 pickle checkpoints
        return pickle.load(f)


def get_extras(payload: dict) -> dict:
    """Host-side extras saved alongside the state ({} for v1 payloads)."""
    if payload.get("version", 1) < 2:
        return {}
    z = payload["npz"]
    return {name: z[f"extra.{name}"] for name in payload["manifest"]["extras"]}


def _cast_like(template_leaf, arr: np.ndarray):
    if hasattr(template_leaf, "dtype"):
        return jax.numpy.asarray(arr, dtype=template_leaf.dtype)
    if np.ndim(arr) == 0:  # python scalar leaf (e.g. optax count)
        return type(template_leaf)(arr.item())
    return arr


def restore_state(state: TrainState, payload: dict) -> TrainState:
    """Restore arrays into an existing (template) state, keeping treedefs.

    Leaf SHAPES come from the checkpoint (progressive grid scaling means the
    saved grids can be larger than a freshly-initialized template); dtypes
    come from the template."""
    if payload.get("version", 1) >= 2:
        z, man = payload["npz"], payload["manifest"]

        def rebuild(sec):
            template = getattr(state, sec)
            paths, leaves, treedef = _flatten_with_paths(template)
            entries = man["sections"][sec]
            if len(entries) != len(leaves):
                raise ValueError(
                    f"checkpoint section {sec} has {len(entries)} leaves, "
                    f"template has {len(leaves)} — config mismatch")
            new = []
            for p, t, e in zip(paths, leaves, entries):
                if p != e["path"]:
                    raise ValueError(f"{sec}: leaf order mismatch "
                                     f"({p!r} vs saved {e['path']!r})")
                new.append(_cast_like(t, z[e["key"]]))
            return jax.tree_util.tree_unflatten(treedef, new)

        scal = man["scalars"]
        return TrainState(
            *(rebuild(sec) for sec in _SECTIONS),
            poses_pnp=jax.numpy.asarray(z["poses_pnp"]),
            step=int(scal["step"]), n_active=int(scal["n_active"]),
            best_val=float(scal["best_val"]))

    # legacy v1 pickle payload: nested numpy trees with matching treedefs
    def merge(template, saved):
        return jax.tree.map(lambda t, s: jax.numpy.asarray(s, dtype=t.dtype)
                            if hasattr(t, "dtype") else s, template, saved)

    return TrainState(
        obj_params=merge(state.obj_params, payload["obj_params"]),
        scene_params=merge(state.scene_params, payload["scene_params"]),
        pose_params=merge(state.pose_params, payload["pose_params"]),
        opt_obj=merge(state.opt_obj, payload["opt_obj"]),
        opt_scene=merge(state.opt_scene, payload["opt_scene"]),
        opt_pose=merge(state.opt_pose, payload["opt_pose"]),
        poses_pnp=jax.numpy.asarray(payload["poses_pnp"]),
        step=payload["step"],
        n_active=payload["n_active"],
        best_val=payload["best_val"],
    )
