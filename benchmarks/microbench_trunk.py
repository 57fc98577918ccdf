"""Microbenchmark: fused Pallas scene-trunk kernel vs the XLA bf16 trunk.

Times fwd+bwd of the production trunk (8x256, skip@4, d_in 63) at the
mid-phase point count (coarse 1024x128 + fine 1024x256 worth of points) on
the real TPU. Also asserts numerical agreement so the first real-hardware run
doubles as the kernel's on-TPU correctness check.

Usage: python benchmarks/microbench_trunk.py [--n 393216] [--iters 30]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from poseprobe_tpu.models import scene_nerf
from poseprobe_tpu.models.scene_nerf import SceneConfig
from poseprobe_tpu.ops.pallas import fused_mlp


def xla_trunk(layers, enc, skip):
    feat = encb = enc.astype(jnp.bfloat16)
    for li, layer in enumerate(layers):
        if li == skip:
            feat = jnp.concatenate([feat, encb], axis=-1)
        w = layer["w"].astype(jnp.bfloat16)
        b = layer["b"].astype(jnp.bfloat16)
        feat = jax.lax.dot_general(feat, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=feat.dtype) + b
        if li == len(layers) - 1:
            raw = feat[..., 0].astype(jnp.float32)
            feat = feat[..., 1:]
        feat = jax.nn.relu(feat)
    return raw, feat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024 * (128 + 256))
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tile", type=int, default=0,
                    help="points per pallas grid step (0 = module default)")
    ap.add_argument("--wt", action="store_true",
                    help="bwd kernel: pre-transposed weights for the dx GEMMs")
    ap.add_argument("--interleave", type=int, default=1,
                    help="independent sub-chains per tile (MXU/VPU overlap)")
    ap.add_argument("--ckpt", type=int, default=-1,
                    help="activation checkpoint stride (0 remat, 1 store all, "
                         "k>=2 every k-th); -1 = sweep 0/1/2 and report")
    args = ap.parse_args()
    if args.tile:
        fused_mlp.TILE = args.tile
    fused_mlp.BWD_WT = args.wt
    fused_mlp.INTERLEAVE = args.interleave
    if args.ckpt >= 0:
        fused_mlp.TRUNK_CKPT = args.ckpt

    cfg = SceneConfig(matmul_dtype="bfloat16")
    skip = cfg.skip[0]
    params = scene_nerf.init_nerf_mlp(jax.random.PRNGKey(0), cfg)["feat"]
    D = cfg.input_3d_dim
    key = jax.random.PRNGKey(1)
    enc0 = jax.random.normal(key, (args.n, D), jnp.float32)

    def loss_fused(params, enc):
        raw, feat = fused_mlp.fused_trunk(enc, params, skip)
        return jax.nn.softplus(raw).mean() + (feat.astype(jnp.float32) ** 2).mean()

    def loss_xla(params, enc):
        raw, feat = xla_trunk(params, enc, skip)
        return jax.nn.softplus(raw).mean() + (feat.astype(jnp.float32) ** 2).mean()

    # correctness on real hardware first
    rf, ff = jax.jit(lambda e: fused_mlp.fused_trunk(e, params, skip))(enc0[:4096])
    rx, fx = jax.jit(lambda e: xla_trunk(params, e, skip))(enc0[:4096])
    derr = float(jnp.abs(rf - rx).max())
    ferr = float(jnp.abs(ff.astype(jnp.float32) - fx.astype(jnp.float32)).max())
    gf = jax.jit(jax.grad(loss_fused))(params, enc0[:4096])
    gx = jax.jit(jax.grad(loss_xla))(params, enc0[:4096])
    rel = max(
        float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)))
    print(f"[parity] density maxerr {derr:.2e}  feat maxerr {ferr:.2e}  "
          f"grad max relerr {rel:.2e}")
    assert derr < 0.05 and ferr < 0.05 and rel < 0.05, "on-TPU parity failed"

    vgf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1)))
    vgx = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1)))

    def timeit(f, tag):
        k = jax.random.PRNGKey(2)
        # vary the input per iter: the axon relay caches identical executions
        (v, g) = f(params, enc0)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for i in range(args.iters):
            k, sub = jax.random.split(k)
            enc = enc0 + jax.random.normal(sub, (1, D), jnp.float32) * 1e-4
            (v, g) = f(params, enc)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / args.iters
        flops = 4 * args.n * sum(l["w"].size for l in params)  # fwd+bwd(+remat)
        print(f"[{tag}] {dt * 1e3:7.2f} ms  ({flops / dt / 1e12:6.1f} TFLOP/s "
              f"incl. remat)" if tag == "fused" else
              f"[{tag}] {dt * 1e3:7.2f} ms  ({3 * args.n * sum(l['w'].size for l in params) / dt / 1e12:6.1f} TFLOP/s)")
        return dt

    t_x = timeit(vgx, "xla  ")
    if args.ckpt >= 0:
        t_f = timeit(vgf, "fused")
        print(f"[speedup] {t_x / t_f:.2f}x  (n={args.n}, ckpt={args.ckpt}, "
              f"{jax.devices()[0].device_kind})")
    else:
        # sweep the activation-store variants (round-5 lever: trade remat
        # matmul passes for pipelined HBM activation traffic)
        for ck in (0, 1, 2):
            def loss_ck(params, enc, _ck=ck):
                raw, feat = fused_mlp.fused_trunk(enc, params, skip, ckpt=_ck)
                return (jax.nn.softplus(raw).mean()
                        + (feat.astype(jnp.float32) ** 2).mean())
            t_f = timeit(jax.jit(jax.value_and_grad(loss_ck, argnums=(0, 1))),
                         f"ckpt{ck}")
            print(f"[speedup] ckpt={ck}: {t_x / t_f:.2f}x  (n={args.n}, "
                  f"{jax.devices()[0].device_kind})")


if __name__ == "__main__":
    main()
