"""Optimizer stack: per-module Adam transforms with reference-matching schedules.

Replaces three reference optimizers with optax transforms:
* object branch `create_optimizer_or_freeze_model` (`lib/utils.py:316-342`) —
  per-module lr (0 => frozen), betas (0.9, 0.99), per-step exponential decay
  `0.1^(1/(lrate_decay*1000))` (`recon_scene.py:742-747`) and the staged
  `decay_step_module` drops (`configs/dtu_e2e/scan1.py:93-96`);
* pose optimizer `create_optimizer_pose` (`lib/utils.py:347-362`) —
  ExponentialLR with gamma = (lr_end/lr)^(1/pose_window);
* scene optimizer `setup_optimizer` (`lib/utils.py:294-314`) — Adam +
  ExponentialLR to lr_end over max_iter, with grad-norm clipping 0.1
  (`default_config.py:41-42`).

The fused CUDA Adam (`lib/cuda/adam_upd*`) is dead code in the reference and
needs no analog: XLA fuses optax's update chain.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config.config import ObjectTrainConfig, SceneTrainConfig

_OBJECT_LABELS = {
    "sdf_grid": "sdf",
    "k0_grid": "k0",
    "rgbnet": "rgbnet",
    "warpnet": "warpnet",
    "sdf_alpha": "sdf_alpha",
    "sdf_beta": "sdf_beta",
    "s_val": "frozen",
}


def _object_lr_schedule(base_lr: float, cfg: ObjectTrainConfig, module: str):
    decay_steps = cfg.lrate_decay * 1000
    events = [(step, dict(factors).get(module)) for step, factors in cfg.decay_step_module]

    def schedule(step):
        lr = base_lr * 0.1 ** (step / decay_steps)
        for ev_step, factor in events:
            if factor is not None:
                lr = lr * jnp.where(step >= ev_step, factor, 1.0)
        return lr

    return schedule


def build_object_optimizer(cfg: ObjectTrainConfig) -> optax.GradientTransformation:
    lrates = {
        "sdf": cfg.lrate_sdf,
        "k0": cfg.lrate_k0,
        "rgbnet": cfg.lrate_rgbnet,
        "warpnet": cfg.lrate_warpnet,
        "sdf_alpha": cfg.lrate_sdf_alpha,
        "sdf_beta": cfg.lrate_sdf_beta,
    }
    transforms: dict[str, optax.GradientTransformation] = {"frozen": optax.set_to_zero()}
    for module, lr in lrates.items():
        if lr <= 0:
            transforms[module] = optax.set_to_zero()
        else:
            transforms[module] = optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.99),
                optax.scale_by_schedule(_object_lr_schedule(lr, cfg, module)),
                optax.scale(-1.0),
            )

    def label_fn(params):
        return {k: jax.tree.map(lambda _: _OBJECT_LABELS[k], v) for k, v in params.items()}

    return optax.multi_transform(transforms, label_fn)


def build_pose_optimizer(cfg: ObjectTrainConfig, pose_window_steps: int,
                         trans_window_steps: int | None = None) -> optax.GradientTransformation:
    """se3 refinement optimizer; a zero lr freezes the poses (DTU e2e configs).

    `trans_window_steps` (TPU-rebuild extension, `SceneTrainConfig.
    ratio_end_pose_trans`): when set past `pose_window_steps`, the ROTATION
    tangent dims (se3[..., :3]) freeze at the rotation window while the
    TRANSLATION dims (se3[..., 3:]) keep their own ExponentialLR decay until
    the translation window. Each dim family gets the reference's
    lr->lr_end decay over its own window length.
    """
    if cfg.lr_pose <= 0:
        return optax.set_to_zero()

    def _gamma(window):
        return (cfg.lr_pose_end / (1e-10 + cfg.lr_pose)) ** (1.0 / max(window, 1))

    if trans_window_steps is None or trans_window_steps == pose_window_steps:
        gamma = _gamma(pose_window_steps)

        def schedule(step):
            # ExponentialLR decays only while the pose window is open; the
            # trainer additionally masks updates past the window
            s = jnp.minimum(step, pose_window_steps)
            return cfg.lr_pose * gamma**s

        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99),
            optax.scale_by_schedule(schedule),
            optax.scale(-1.0),
        )

    # split windows: per-dim lr vector [6] = [rot x3 | trans x3]; the trainer's
    # pose_on flag stays open until max(window), so each family must zero its
    # own lr past its window here.
    g_rot, g_trans = _gamma(pose_window_steps), _gamma(trans_window_steps)

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        step = state.count
        lr_rot = (cfg.lr_pose * g_rot ** jnp.minimum(step, pose_window_steps)
                  * (step < pose_window_steps))
        lr_trans = (cfg.lr_pose * g_trans ** jnp.minimum(step, trans_window_steps)
                    * (step < trans_window_steps))
        lr_vec = jnp.concatenate([jnp.broadcast_to(lr_rot, (3,)),
                                  jnp.broadcast_to(lr_trans, (3,))])
        updates = jax.tree.map(lambda u: u * lr_vec, updates)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.99),
        optax.GradientTransformation(init_fn, update_fn),
        optax.scale(-1.0),
    )


def build_scene_optimizer(cfg: SceneTrainConfig) -> optax.GradientTransformation:
    gamma = (cfg.lr_end / cfg.lr) ** (1.0 / cfg.max_iter)

    def schedule(step):
        return cfg.lr * gamma**step

    chain = [optax.scale_by_adam(b1=0.9, b2=0.999),
             optax.scale_by_schedule(schedule),
             optax.scale(-1.0)]
    if cfg.nerf_gradient_clipping:
        chain.insert(0, optax.clip_by_global_norm(cfg.nerf_gradient_clipping))
    return optax.chain(*chain)


def tree_any_nonfinite(tree: Any) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    bad = jnp.asarray(False)
    for leaf in leaves:
        bad = bad | jnp.any(~jnp.isfinite(leaf))
    return bad
