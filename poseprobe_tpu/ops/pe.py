"""Positional encoding with BARF coarse-to-fine frequency masking.

Two encoders exist in the reference with slightly different layouts; both are
reproduced:
* Object branch (`lib/voxurf_coarse.py:1011-1023`): per-frequency interleave
  [sin(all L), cos(all L)] with frequencies 2^k (no pi).
* Scene branch `FrequencyEmbedder` (`frequency_nerf.py:42-69`): frequencies
  2^k * pi, layout stack([sin, cos], dim=-2) flattened.

The BARF coarse-to-fine weight (`frequency_nerf.py:248-258`,
`lib/voxurf_coarse.py:721-732`) is computed from a traced `progress` scalar
instead of a mutated module buffer — jit-friendly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def barf_weights(progress, L: int, barf_c2f) -> jnp.ndarray:
    """Per-frequency [L] weights in [0, 1] given progress in [0, 1]."""
    if barf_c2f is None:
        return jnp.ones((L,), dtype=jnp.float32)
    start, end = barf_c2f
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * np.pi)) / 2.0


def posenc_object(x: jnp.ndarray, L: int, progress, barf_c2f) -> jnp.ndarray:
    """Object-branch PE: [..., C] -> [..., C + 2*C*L] = [x, masked(sin, cos)].

    Layout matches `xyz_emb = (x[...,None]*freqs).flatten(-2); cat([sin, cos])`
    then BARF masking applied on a trailing reshape to L
    (`lib/voxurf_coarse.py:1011-1016`).
    """
    freqs = 2.0 ** jnp.arange(L, dtype=jnp.float32)
    spec = x[..., None] * freqs  # [..., C, L]
    spec = spec.reshape(x.shape[:-1] + (-1,))  # [..., C*L]
    enc = jnp.concatenate([jnp.sin(spec), jnp.cos(spec)], axis=-1)  # [..., 2CL]
    w = barf_weights(progress, L, barf_c2f)
    enc = (enc.reshape(-1, L) * w).reshape(enc.shape)
    return jnp.concatenate([x, enc], axis=-1)


def posenc_scene(x: jnp.ndarray, L: int, progress, barf_c2f,
                 include_pi: bool = True, add_raw: bool = True) -> jnp.ndarray:
    """Scene-branch PE: [..., C] -> [..., (C +) 2*C*L].

    Layout matches `FrequencyEmbedder` + BARF weighting
    (`frequency_nerf.py:47-69,229-258`): stack([sin, cos], -2) over [C, L],
    flattened to [..., 2CL], masked per-frequency.
    """
    freqs = 2.0 ** jnp.arange(L, dtype=jnp.float32)
    if include_pi:
        freqs = freqs * np.pi
    spec = x[..., None] * freqs  # [..., C, L]
    enc = jnp.stack([jnp.sin(spec), jnp.cos(spec)], axis=-2)  # [..., C, 2, L]
    enc = enc.reshape(x.shape[:-1] + (-1,))  # [..., 2CL]
    w = barf_weights(progress, L, barf_c2f)
    enc = (enc.reshape(-1, L) * w).reshape(enc.shape)
    if add_raw:
        return jnp.concatenate([x, enc], axis=-1)
    return enc
