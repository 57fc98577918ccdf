"""Microbenchmark the fine-sampling pass internals at bench scale.

The step ablation (PERFORMANCE.md) shows fine sampling costs 123 ms of the
160 ms mid-phase step; this breaks that down: coarse render, full
coarse+fine render, PDF resampling alone, depth sort, and the raw MLP
eval — each timed fwd and fwd+bwd where meaningful, with per-iteration
fresh inputs (the axon relay caches identical executions).

Usage: python benchmarks/microbench_fine.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2, key_arg=False):
    key = jax.random.PRNGKey(0)
    out = None
    for i in range(warmup + iters):
        if i == warmup:
            jax.block_until_ready(out)
            t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        out = fn(sub, *args) if key_arg else fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from poseprobe_tpu.models import scene_nerf
    from poseprobe_tpu.ops import ray_sampling

    cfg = scene_nerf.SceneConfig(max_iter=60000, fine_sampling=True,
                                 matmul_dtype="bfloat16")
    cfg32 = scene_nerf.SceneConfig(max_iter=60000, fine_sampling=True,
                                   matmul_dtype="float32")
    params = scene_nerf.init_scene_params(jax.random.PRNGKey(0), cfg)
    B, R, S = 1, 1024, cfg.sample_intvs
    depth_range = (0.5, 6.0)

    center = jnp.zeros((B, R, 3))
    z = jnp.linspace(-0.2, 0.2, R)
    ray = jnp.stack([z, jnp.zeros(R), jnp.ones(R)], -1)[None]

    def render(key, fine, c):
        return scene_nerf.render_rays(params, c, center, ray, depth_range,
                                      progress=1.0, rng=key, compute_fine=fine)

    def render_loss(key, fine, c):
        out = render(key, fine, c)
        k = "rgb_fine" if fine else "rgb"
        return out[k].sum()

    coarse_f = jax.jit(lambda k: render_loss(k, False, cfg))
    full_f = jax.jit(lambda k: render_loss(k, True, cfg))
    full_f32 = jax.jit(lambda k: render_loss(k, True, cfg32))
    coarse_g = jax.jit(jax.grad(lambda p, k: scene_nerf.render_rays(
        p, cfg, center, ray, depth_range, 1.0, rng=k, compute_fine=False)["rgb"].sum()))
    full_g = jax.jit(jax.grad(lambda p, k: scene_nerf.render_rays(
        p, cfg, center, ray, depth_range, 1.0, rng=k, compute_fine=True)["rgb_fine"].sum()))

    print(f"coarse fwd        {timeit(coarse_f, key_arg=True)*1e3:8.2f} ms")
    print(f"coarse+fine fwd   {timeit(full_f, key_arg=True)*1e3:8.2f} ms")
    print(f"coarse+fine fwd32 {timeit(full_f32, key_arg=True)*1e3:8.2f} ms")
    print(f"coarse bwd        {timeit(lambda k: coarse_g(params, k), key_arg=True)*1e3:8.2f} ms")
    print(f"coarse+fine bwd   {timeit(lambda k: full_g(params, k), key_arg=True)*1e3:8.2f} ms")

    # PDF resampling alone
    weights = jax.random.uniform(jax.random.PRNGKey(3), (B, R, S))

    @jax.jit
    def resample(key, w):
        return ray_sampling.sample_depth_from_pdf(key, w, S, cfg.sample_intvs_fine,
                                                  depth_range[0], depth_range[1])

    print(f"pdf resample      {timeit(lambda k: resample(k, weights), key_arg=True)*1e3:8.2f} ms")

    # depth sort alone (concat coarse+fine then sort, as in the fine pass)
    d1 = jax.random.uniform(jax.random.PRNGKey(4), (B, R, S, 1))
    @jax.jit
    def dsort(key, a):
        b = jax.random.uniform(key, a.shape)
        return jnp.sort(jnp.concatenate([a, b], axis=2), axis=2)

    print(f"depth sort 2S     {timeit(lambda k: dsort(k, d1), key_arg=True)*1e3:8.2f} ms")

    # raw MLP eval at fine scale (R x 2S samples)
    pts = jax.random.uniform(jax.random.PRNGKey(5), (B, R, 2 * S, 3))
    @jax.jit
    def mlp_eval(key, p):
        pp = p + jax.random.uniform(key, (1,))  # defeat relay caching
        return scene_nerf.nerf_forward(params["nerf"], cfg, pp, ray, 1.0)["rgb_samples"].sum()

    print(f"mlp fwd 2S        {timeit(lambda k: mlp_eval(k, pts), key_arg=True)*1e3:8.2f} ms")
    mlp_g = jax.jit(jax.grad(lambda p, k: scene_nerf.nerf_forward(
        p, cfg, pts + jax.random.uniform(k, (1,)), ray, 1.0)["rgb_samples"].sum()))
    print(f"mlp fwd+bwd 2S    {timeit(lambda k: mlp_g(params['nerf'], k), key_arg=True)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
