"""Minimal functional MLP helpers (param pytrees, explicit init schemes).

The framework stores every network as a plain pytree ``[{'w': [in, out],
'b': [out]}, ...]`` — no module system. This keeps the whole model state a
single pytree for optax/pjit and makes weight surgery (freezing, per-module
learning rates) a matter of tree paths.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def init_linear(key, d_in: int, d_out: int, scheme: str = "torch") -> dict:
    """One linear layer. Schemes:

    * ``torch``: PyTorch nn.Linear default (kaiming-uniform weight, uniform bias) —
      used by the reference color MLP (`lib/voxurf_coarse.py:208-216`).
    * ``kaiming_normal``: used by the deform net (`lib/deformation/modules.py:127-130`).
    * ``xavier_relu`` / ``xavier``: tensorflow-style init of the scene NeRF
      (`frequency_nerf.py:136-147`), with/without the relu gain.
    * ``zeros``: last-layer zero init of the deform net (`modules.py:166-171`).
    """
    wkey, bkey = jax.random.split(key)
    if scheme == "torch":
        # kaiming_uniform(a=sqrt(5)) reduces to U(+-1/sqrt(fan_in)) for weight and bias
        bound = 1.0 / math.sqrt(d_in)
        w = _uniform(wkey, (d_in, d_out), bound)
        b = _uniform(bkey, (d_out,), bound)
    elif scheme == "kaiming_normal":
        w = jax.random.normal(wkey, (d_in, d_out)) * math.sqrt(2.0 / d_in)
        b = jnp.zeros((d_out,))
    elif scheme == "xavier_relu":
        gain = math.sqrt(2.0)
        bound = gain * math.sqrt(6.0 / (d_in + d_out))
        w = _uniform(wkey, (d_in, d_out), bound)
        b = jnp.zeros((d_out,))
    elif scheme == "xavier":
        bound = math.sqrt(6.0 / (d_in + d_out))
        w = _uniform(wkey, (d_in, d_out), bound)
        b = jnp.zeros((d_out,))
    elif scheme == "zeros":
        w = jnp.zeros((d_in, d_out))
        b = jnp.zeros((d_out,))
    else:
        raise ValueError(scheme)
    return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}


def init_mlp(key, dims: Sequence[int], scheme: str = "torch", last_scheme: str | None = None) -> list:
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        s = last_scheme if (last_scheme is not None and i == len(dims) - 2) else scheme
        layers.append(init_linear(keys[i], d_in, d_out, s))
    return layers


def apply_mlp(layers: list, x: jnp.ndarray, final_activation=None) -> jnp.ndarray:
    """ReLU MLP; no activation on the last layer unless given."""
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    if final_activation is not None:
        x = final_activation(x)
    return x
