"""Grid tensor parallelism: Z-sharded trilinear sampling + TV must be EXACT.

`parallel/grid_tp.py` claims parity with the unsharded ops to f32 rounding
(values, border clamp, gradients wrt grid and points; the locally rebased
z coordinate changes the floating-point path by ~1e-6 relative) — the halo
plane plus the slab-ownership psum reconstructs the same interpolation, and
the last
shard's duplicated halo makes out-of-box z-gradients exactly zero like the
global clamp mask does. These tests check every claim on the virtual
8-device CPU mesh (conftest), including the combined ('data','grid') mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseprobe_tpu.ops import grid as grid_ops
from poseprobe_tpu.parallel import grid_tp


def _setup(C=5, X=9, Y=7, Z=16, n=257, seed=0, seams=True):
    rng = np.random.RandomState(seed)
    grid = jnp.asarray(rng.randn(C, X, Y, Z).astype(np.float32))
    xyz_min = jnp.asarray([-1.0, -0.5, -2.0])
    xyz_max = jnp.asarray([1.0, 1.5, 2.0])
    # points spanning inside, outside (clamped), and exactly-on-boundary
    pts = rng.uniform(-1.6, 1.6, size=(n, 3)).astype(np.float32) * np.asarray(
        [1.0, 1.0, 2.6], dtype=np.float32)
    if seams:
        pts[:11, 2] = np.linspace(-2.0, 2.0, 11)  # global z edges + shard seams
    else:
        # gradient tests: keep z a few ulp away from every cell seam — the
        # trilerp derivative is one-sided there, and the rebased local
        # coordinate can round to the other side of the seam than the global
        # one (picking the abutting cell's slope). Values are continuous
        # across seams, so only derivative comparisons need this.
        iz = (pts[:, 2] - (-2.0)) / 4.0 * (Z - 1)
        off = np.abs(iz - np.round(iz)) < 1e-2
        pts[off, 2] += 0.01
    return grid, jnp.asarray(pts), xyz_min, xyz_max


@pytest.mark.parametrize("n_grid", [2, 4, 8])
def test_sample_parity(n_grid):
    grid, pts, lo, hi = _setup()
    mesh = grid_tp.make_grid_mesh(1, n_grid)
    ref = grid_ops.trilinear_sample(grid, pts, lo, hi)
    out = grid_tp.sample_grid_tp(grid, pts, lo, hi, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sample_parity_sharded_placement():
    """Same result when the grid is physically placed Z-sharded first."""
    grid, pts, lo, hi = _setup()
    mesh = grid_tp.make_grid_mesh(2, 4)
    gs = grid_tp.shard_grid(grid, mesh)
    ref = grid_ops.trilinear_sample(grid, pts, lo, hi)
    out = jax.jit(
        lambda g, p: grid_tp.sample_grid_tp(g, p, lo, hi, mesh))(gs, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_data_sharded_points():
    """Rays-DP x grid-TP: points sharded over 'data', grid over 'grid'."""
    grid, pts, lo, hi = _setup(n=256)
    mesh = grid_tp.make_grid_mesh(2, 4)
    ref = grid_ops.trilinear_sample(grid, pts, lo, hi)
    out = grid_tp.sample_grid_tp(grid, pts, lo, hi, mesh,
                                 data_sharded_points=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradient_parity():
    """Grads wrt grid AND points match the unsharded custom-VJP path."""
    grid, pts, lo, hi = _setup(n=97, seams=False)
    mesh = grid_tp.make_grid_mesh(1, 4)

    def loss_ref(g, p):
        return jnp.sum(jnp.sin(grid_ops.trilinear_sample(g, p, lo, hi)))

    def loss_tp(g, p):
        return jnp.sum(jnp.sin(grid_tp.sample_grid_tp(g, p, lo, hi, mesh)))

    gg_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(grid, pts)
    gg_tp, gp_tp = jax.grad(loss_tp, argnums=(0, 1))(grid, pts)
    np.testing.assert_allclose(np.asarray(gg_tp), np.asarray(gg_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gp_tp), np.asarray(gp_ref), atol=5e-5)


def test_batched_shape():
    grid, pts, lo, hi = _setup(n=60)
    mesh = grid_tp.make_grid_mesh(1, 4)
    out = grid_tp.sample_grid_tp(grid, pts.reshape(5, 12, 3), lo, hi, mesh)
    assert out.shape == (5, 12, grid.shape[0])
    ref = grid_ops.trilinear_sample(grid, pts, lo, hi).reshape(5, 12, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_tv_parity(use_mask):
    grid, _, _, _ = _setup(C=2, Z=16)
    mesh = grid_tp.make_grid_mesh(1, 4)
    mask = None
    if use_mask:
        rng = np.random.RandomState(3)
        mask = jnp.asarray(rng.rand(*grid.shape) > 0.4)
    ref = grid_ops.total_variation(grid, mask)
    out = grid_tp.total_variation_tp(grid, mesh, mask)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)


def test_tv_gradient_parity():
    grid, _, _, _ = _setup(C=1, Z=8)
    mesh = grid_tp.make_grid_mesh(1, 4)
    g_ref = jax.grad(lambda v: grid_ops.total_variation(v))(grid)
    g_tp = jax.grad(lambda v: grid_tp.total_variation_tp(v, mesh))(grid)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref), atol=2e-5)


def test_indivisible_z_raises():
    grid, pts, lo, hi = _setup(Z=15)
    mesh = grid_tp.make_grid_mesh(1, 4)
    with pytest.raises(ValueError, match="not divisible"):
        grid_tp.sample_grid_tp(grid, pts, lo, hi, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        grid_tp.shard_grid(grid, mesh)
