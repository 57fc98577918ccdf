"""Implicit deformation field of the object pose-probe.

Functional analog of `DeformedImplicitField` (`lib/deformation/deform_net.py:12-29`)
+ `SingleBVPNet`/`FCBlock` (`lib/deformation/modules.py:43-124`): a ReLU MLP
3 -> 128 x (1 + 3 hidden) -> 4 whose output, scaled by ``output_range``
(= range_shape.max()), splits into a 3D coordinate offset and a scalar SDF
correction. The last layer is zero-initialized (`modules.py:166-171`) so the
field starts as the identity.

Jacobians w.r.t. the query points are taken with plain jax.grad — no
higher-order autograd machinery needed (cf. the reference's
`create_graph=True` calls, `lib/voxurf_coarse.py:972-984`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mlp import apply_mlp, init_mlp

HIDDEN = 128
NUM_HIDDEN_LAYERS = 3


def init_deform_params(key, output_range: float) -> dict:
    dims = [3] + [HIDDEN] * (NUM_HIDDEN_LAYERS + 1) + [4]
    return {
        "layers": init_mlp(key, dims, scheme="kaiming_normal", last_scheme="zeros"),
        # static scale captured as an array so checkpoints are self-describing
        "output_range": jnp.asarray(output_range, dtype=jnp.float32),
    }


def apply_deform(params: dict, pts: jnp.ndarray):
    """pts [..., 3] -> (deform [..., 3], correction [..., 1])."""
    out = apply_mlp(params["layers"], pts) * params["output_range"]
    return out[..., :3], out[..., 3:]


def deform_with_jacobian_fwd(params: dict, pts: jnp.ndarray):
    """Forward-mode variant returning everything the renderer needs in one go.

    Returns (deform [..., 3], correction [..., 1],
             jac_warp [..., 3, 3] with jac[..., j, i] = d(pts+deform)_i/d pts_j,
             grad_corr [..., 3]).

    One shared forward pass propagates the primal and ALL THREE basis
    tangents together (the ReLU masks are computed once and reused), instead
    of three separate `jax.jvp` re-traversals — 4 matmul passes instead of 7,
    and the tangent matmuls batch as one [..., 3, H] contraction. No backward
    graphs, so the outer loss backward stays first-order (vs. the reference's
    create_graph=True VJPs, `lib/voxurf_coarse.py:972-984`).
    """
    layers = params["layers"]
    scale = params["output_range"]
    h = pts                                            # [..., 3]
    eye = jnp.eye(3, dtype=pts.dtype)
    tang = jnp.broadcast_to(eye, pts.shape[:-1] + (3, 3))  # [..., 3(in), 3]
    pre = h
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        pre = h @ w + b                                # [..., out]
        tang = tang @ w                                # [..., 3(in), out]
        if i < len(layers) - 1:
            mask = pre > 0
            h = jnp.where(mask, pre, 0.0)
            tang = jnp.where(mask[..., None, :], tang, 0.0)
    out = pre * scale                                  # [..., 4]
    jac4 = tang * scale                                # [..., 3(in), 4(out)]
    deform, correction = out[..., :3], out[..., 3:]
    jac_warp = jac4[..., :3] + eye  # + identity: d(pts + deform)/d pts
    grad_corr = jac4[..., 3]
    return deform, correction, jac_warp, grad_corr


def deform_with_jacobian(params: dict, pts: jnp.ndarray):
    """Returns (deform, correction, d(new_coords)/d(pts) [..., 3, 3]).

    new_coords = pts + deform(pts); the Jacobian is needed for the
    grad_deform prior (`lib/voxurf_coarse.py:972-975`, `lib/losses.py:12`).
    Note the reference's `grad_deform` is actually the Jacobian of the
    *warped coordinates* (identity + deformation), and its loss penalizes its
    row norms; we reproduce exactly that.
    """
    deform, correction = apply_deform(params, pts)

    def coord_i(i):
        def f(p):
            d, _ = apply_deform(params, p)
            return (p[..., i] + d[..., i]).sum()
        return jax.grad(f)(pts)

    # layout matches the reference stack(dim=2): jac[..., j, i] = d new_i / d pts_j
    jac = jnp.stack([coord_i(0), coord_i(1), coord_i(2)], axis=-1)
    return deform, correction, jac
