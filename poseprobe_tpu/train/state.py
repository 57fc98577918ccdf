"""Training state pytree + self-describing checkpoints.

The two reference checkpoint families (`last_ckpt.tar` object state,
`model_last/best.pth.tar` scene state; see `lib/recon_scene.py:779-791`,
`renderer.py:1028-1051`) collapse into one atomic checkpoint of the full
TrainState pytree plus a JSON sidecar of the static configs — the checkpoint
is self-describing like the reference's saved `model_kwargs`.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any

import jax
import numpy as np


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


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: TrainState, configs: dict | None = None) -> None:
    """Atomic write (tmp + rename), like orbax's atomicity guarantee."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "obj_params": _to_numpy(state.obj_params),
        "scene_params": _to_numpy(state.scene_params),
        "pose_params": _to_numpy(state.pose_params),
        "opt_obj": _to_numpy(state.opt_obj),
        "opt_scene": _to_numpy(state.opt_scene),
        "opt_pose": _to_numpy(state.opt_pose),
        "poses_pnp": np.asarray(state.poses_pnp),
        "step": int(state.step),
        "n_active": int(state.n_active),
        "best_val": float(state.best_val),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    if configs is not None:
        with open(path + ".json", "w") as f:
            json.dump(configs, f, indent=2, default=str)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(state: TrainState, payload: dict) -> TrainState:
    """Restore arrays into an existing (template) state, keeping treedefs."""

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
