"""Pallas TPU kernel: fused scene-NeRF trunk (8x256 MLP) forward + backward.

The scene MLP (`frequency_nerf.py:172-281` rebuilt in
`models/scene_nerf.nerf_forward`) evaluates ~1M points/step in the fine phase.
As plain XLA, every one of the 8 trunk matmuls materialises a [N, 256]
activation tensor in HBM (~0.5 GB each way per layer at N=1M), so the trunk
runs HBM-bound at roughly a third of the MXU roofline. This kernel keeps the
whole trunk — input tile, all hidden activations, every weight matrix — in
VMEM:

* forward: one grid step per point tile; 8 matmuls back-to-back on the MXU,
  only the encoded input ([N, 128] bf16) is read and only the output
  ([N, H+128] bf16: raw density in column 0, relu'd feature in 1:H+1) is
  written.
* backward: recomputes the forward per tile in VMEM (rematerialisation — the
  fwd stores nothing), then backpropagates through the tile, accumulating
  per-layer dW/db in f32 VMEM across sequential grid steps and writing them
  once. HBM traffic is inputs + output-grads + the (tiny) weight grads.

Layout contract (padding done by the `fused_trunk` wrapper):
* input dim padded to 128; skip-layer weights padded to [H+128, H] with the
  feature rows first (matching `nerf_forward`'s `concat([feat, enc])`);
* last layer padded to H+128 output columns (col 0 = density, 1:H+1 = feat);
* points padded to a TILE multiple (padded rows get zero output-grads, so
  they cannot pollute the weight grads).

Numerics match the XLA bf16 path: bf16 operands, f32 MXU accumulation,
activations rounded to bf16 between layers; dW/db accumulate in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # default point-tile; override per call (see fused_trunk(tile=))
IN_PAD = 128  # encoded-input width after padding (63 -> 128 for L_3D=10)

# Tuning switches (read at trace time; benchmarks/microbench_trunk.py A/Bs
# them on the real TPU before they become defaults). Env overrides
# POSEPROBE_TRUNK_WT=1 / POSEPROBE_TRUNK_INTERLEAVE=N let any CLI
# (bench.py, run.py) A/B a variant at the full-train-step level:
# * BWD_WT: feed the backward kernel pre-transposed copies of every weight
#   matrix so the dx matmul is a plain row-major GEMM instead of making
#   Mosaic re-transpose the [D, H] weight on every grid step.
# * INTERLEAVE: process the point tile as this many independent sub-chains,
#   interleaved layer-by-layer, so the MXU matmul of one sub-chain can
#   overlap the VPU relu/round of the other (the 8 trunk matmuls are
#   otherwise one serial dependency chain per tile).
import os as _os

BWD_WT = _os.environ.get("POSEPROBE_TRUNK_WT", "") == "1"
INTERLEAVE = int(_os.environ.get("POSEPROBE_TRUNK_INTERLEAVE", "1"))
# Activation checkpointing stride (round-4 perf lever: the remat backward is
# exactly 3x fwd = 8 remat + 8 dx + 8 dW passes; storing activations trades
# remat matmul passes for HBM activation traffic that Pallas's grid pipeline
# overlaps with the MXU passes):
#   0 = full remat (store nothing; 7 remat passes since the last layer's
#       relu' mask now comes from the forward's own `feat` output),
#   1 = store every hidden activation (no remat passes; max HBM traffic),
#   k>=2 = store every k-th activation, remat the rest from the nearest
#       stored predecessor (half the traffic at k=2 for 3 remat passes).
# Default 1: measured on TPU v5e at the fine-phase point count (393k,
# microbench_trunk 2026-08-20) ckpt1 11.85 ms vs ckpt0 12.82 vs ckpt2
# 12.23 — the pipelined activation DMA hides fully under the MXU passes.
TRUNK_CKPT = int(_os.environ.get("POSEPROBE_TRUNK_CKPT", "1"))


def _stored_layers(L: int, ckpt: int) -> tuple:
    """Hidden-activation indices (0..L-2) the forward stores for `ckpt`."""
    if ckpt <= 0:
        return ()
    return tuple(range(ckpt - 1, L - 1, ckpt))


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward kernel


def _fwd_kernel_factory(L: int, skip: int, H: int, nh: int = 1,
                        stored: tuple = ()):
    n_stored = len(stored)
    stored_slot = {l: s for s, l in enumerate(stored)}

    def kernel(*refs):
        enc_ref = refs[0]
        w_refs = refs[1:1 + L]
        b_refs = refs[1 + L:1 + 2 * L]
        feat_ref = refs[1 + 2 * L]
        dens_ref = refs[2 + 2 * L]
        acts_ref = refs[3 + 2 * L] if n_stored else None

        x_all = enc_ref[...]  # [T, IN_PAD] bf16
        Th = x_all.shape[0] // nh
        xs = [x_all[h * Th:(h + 1) * Th] for h in range(nh)]
        a = list(xs)
        for l in range(L):
            for h in range(nh):
                inp = jnp.concatenate([a[h], xs[h]], axis=-1) if l == skip else a[h]
                pre = jax.lax.dot_general(
                    inp, w_refs[l][...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pre = pre + b_refs[l][...].astype(jnp.float32)
                if l == L - 1:
                    # last layer's padded columns are [feat(H) | density |
                    # zeros] (reordered by the wrapper), so both outputs are
                    # lane-aligned slices — no iota select, no downstream
                    # offset-1 slice copy
                    feat_ref[h * Th:(h + 1) * Th, :] = (
                        jax.nn.relu(pre[:, :H]).astype(jnp.bfloat16))
                    dens_ref[h * Th:(h + 1) * Th, :] = pre[:, H:]
                else:
                    a[h] = jax.nn.relu(pre).astype(jnp.bfloat16)
                    if l in stored_slot:
                        acts_ref[stored_slot[l], h * Th:(h + 1) * Th, :] = a[h]

    return kernel


def _trunk_fwd_call(enc, ws, bs, skip, interpret, tile, ckpt=0):
    """enc [N_pad, IN_PAD] bf16; ws/bs padded bf16.

    Returns (feat [N_pad, H] bf16, dens [N_pad, IN_PAD] f32 — density in
    column 0[, acts [n_stored, N_pad, H] bf16 when ckpt > 0])."""
    L = len(ws)
    H = ws[0].shape[1]
    N = enc.shape[0]
    n_tiles = N // tile
    stored = _stored_layers(L, ckpt)
    flops_layer = sum(2 * tile * w.shape[0] * w.shape[1] for w in ws)
    out_shape = [jax.ShapeDtypeStruct((N, H), jnp.bfloat16),
                 jax.ShapeDtypeStruct((N, IN_PAD), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, H), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if stored:
        out_shape.append(
            jax.ShapeDtypeStruct((len(stored), N, H), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((len(stored), tile, H),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _fwd_kernel_factory(L, skip, H, nh=INTERLEAVE, stored=stored),
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in ws]
            + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for b in bs]),
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * flops_layer,
            bytes_accessed=N * (IN_PAD + H + IN_PAD + len(stored) * H) * 2,
            transcendentals=0),
        interpret=interpret,
    )(enc, *ws, *bs)


# ---------------------------------------------------------------------------
# backward kernel


def _bwd_kernel_factory(L: int, skip: int, H: int, use_wt: bool = False,
                        nh: int = 1, stored: tuple = ()):
    stored_slot = {l: s for s, l in enumerate(stored)}

    def kernel(*refs):
        enc_ref = refs[0]
        gf_ref = refs[1]                # [T, H] feat cotangent
        gd_ref = refs[2]                # [T, IN_PAD] density cotangent (col 0)
        feat_ref = refs[3]              # [T, H] fwd feat output (relu' mask:
        # relu(pre) > 0 <=> pre > 0, so the forward's own output replaces the
        # rematerialised last-layer pre-activation — one matmul pass fewer
        # and no [T, H+128] f32 scratch)
        base = 4
        acts_in = None
        if stored:
            acts_in = refs[base]        # [n_stored, T, H] bf16 stored acts
            base += 1
        w_refs = refs[base:base + L]
        b_refs = refs[base + L:base + 2 * L]
        base += 2 * L
        wt_refs = None
        if use_wt:
            wt_refs = refs[base:base + L]
            base += L
        denc_ref = refs[base]
        dw_refs = refs[base + 1:base + 1 + L]
        db_refs = refs[base + 1 + L:base + 1 + 2 * L]

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            for l in range(L):
                dw_refs[l][...] = jnp.zeros_like(dw_refs[l])
                db_refs[l][...] = jnp.zeros_like(db_refs[l])

        x_all = enc_ref[...]  # [T, IN_PAD] bf16
        Th = x_all.shape[0] // nh
        hs = [slice(h * Th, (h + 1) * Th) for h in range(nh)]
        xs = [x_all[s] for s in hs]

        # --- hidden activations a[0..L-2]: read the stored ones, recompute
        # the rest from the nearest stored predecessor (full remat when
        # `stored` is empty). Only layers 0..L-2 are needed: the last layer's
        # relu' mask comes from feat_ref.
        acts = [[None] * (L - 1) for _ in range(nh)]
        for l in range(L - 1):
            for h in range(nh):
                if l in stored_slot:
                    acts[h][l] = acts_in[stored_slot[l], hs[h]]
                else:
                    prev = xs[h] if l == 0 else acts[h][l - 1]
                    inp = (jnp.concatenate([prev, xs[h]], axis=-1)
                           if l == skip else prev)
                    pre = jax.lax.dot_general(
                        inp, w_refs[l][...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pre = pre + b_refs[l][...].astype(jnp.float32)
                    acts[h][l] = jax.nn.relu(pre).astype(jnp.bfloat16)

        # --- backward through the tile
        # NOTE: all relu' masks compare in f32 — v5e Mosaic rejects bf16
        # vector comparisons ("Target does not support this comparison").
        g_pre = [jnp.concatenate(
            [jnp.where(feat_ref[s, :].astype(jnp.float32) > 0.0,
                       gf_ref[s, :].astype(jnp.float32), 0.0),
             gd_ref[s, :].astype(jnp.float32)], axis=1) for s in hs]
        g_enc_skip = [None] * nh
        for l in range(L - 1, -1, -1):
            dw_acc = None
            db_acc = None
            for h in range(nh):
                if l == 0:
                    inp = xs[h]
                elif l == skip:
                    inp = jnp.concatenate([acts[h][l - 1], xs[h]], axis=-1)
                else:
                    inp = acts[h][l - 1]
                g_bf = g_pre[h].astype(jnp.bfloat16)
                dw = jax.lax.dot_general(inp, g_bf, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dw_acc = dw if dw_acc is None else dw_acc + dw
                db = jnp.sum(g_pre[h], axis=0, keepdims=True)
                db_acc = db if db_acc is None else db_acc + db
                if use_wt:
                    g_x = jax.lax.dot_general(g_bf, wt_refs[l][...],
                                              (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32)
                else:
                    g_x = jax.lax.dot_general(g_bf, w_refs[l][...],
                                              (((1,), (1,)), ((), ())),
                                              preferred_element_type=jnp.float32)
                if l == 0:
                    denc_ref[hs[h], :] = g_x.astype(jnp.bfloat16)
                elif l == skip:
                    g_enc_skip[h] = g_x[:, H:]
                    mask = acts[h][l - 1].astype(jnp.float32) > 0.0
                    g_pre[h] = jnp.where(mask, g_x[:, :H], 0.0)
                else:
                    mask = acts[h][l - 1].astype(jnp.float32) > 0.0
                    g_pre[h] = jnp.where(mask, g_x, 0.0)
            dw_refs[l][...] += dw_acc
            db_refs[l][...] += db_acc
        # add the skip branch's enc gradient (layer-0 write above ran last)
        if skip > 0:
            for h in range(nh):
                denc_ref[hs[h], :] += g_enc_skip[h].astype(jnp.bfloat16)

    return kernel


def _trunk_bwd_call(enc, g_feat, g_dens, feat, acts, ws, bs, skip, interpret,
                    tile, ckpt=0):
    L = len(ws)
    H = ws[0].shape[1]
    N = enc.shape[0]
    n_tiles = N // tile
    use_wt = BWD_WT
    stored = _stored_layers(L, ckpt)
    wts = [jnp.swapaxes(w, 0, 1) for w in ws] if use_wt else []
    flops_layer = sum(2 * tile * w.shape[0] * w.shape[1] for w in ws)
    # matmul passes: (L-1 - n_stored) remat + L dx + L dW
    n_passes = (L - 1 - len(stored)) + 2 * L
    out_shapes = (
        [jax.ShapeDtypeStruct((N, IN_PAD), jnp.bfloat16)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    out_specs = (
        [pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bs])
    acts_args, acts_specs = [], []
    if stored:
        acts_args = [acts]
        acts_specs = [pl.BlockSpec((len(stored), tile, H),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        _bwd_kernel_factory(L, skip, H, use_wt=use_wt, nh=INTERLEAVE,
                            stored=stored),
        out_shape=out_shapes,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
             pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
             pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
             pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            + acts_specs
            + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in ws]
            + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for b in bs]
            + [pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for wt in wts]),
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=n_passes * n_tiles * flops_layer // L,
            bytes_accessed=N * (IN_PAD + H + IN_PAD
                                + (1 + len(stored)) * H) * 4,
            transcendentals=0),
        interpret=interpret,
    )(enc, g_feat, g_dens, feat, *acts_args, *ws, *bs, *wts)
    denc = outs[0]
    dws = outs[1:1 + L]
    dbs = outs[1 + L:]
    return denc, list(dws), list(dbs)


# ---------------------------------------------------------------------------
# custom-vjp wrapper over the padded shapes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _trunk_padded(enc, ws, bs, skip, interpret, tile, ckpt):
    outs = _trunk_fwd_call(enc, ws, bs, skip, interpret, tile, ckpt)
    return outs[0], outs[1]


def _trunk_padded_fwd(enc, ws, bs, skip, interpret, tile, ckpt):
    outs = _trunk_fwd_call(enc, ws, bs, skip, interpret, tile, ckpt)
    feat, dens = outs[0], outs[1]
    acts = outs[2] if ckpt > 0 else None
    return (feat, dens), (enc, ws, bs, feat, acts)


def _trunk_padded_bwd(skip, interpret, tile, ckpt, res, g_out):
    enc, ws, bs, feat, acts = res
    g_feat, g_dens = g_out
    denc, dws, dbs = _trunk_bwd_call(enc, g_feat.astype(jnp.bfloat16),
                                     g_dens.astype(jnp.bfloat16),
                                     feat, acts,
                                     ws, bs, skip, interpret, tile, ckpt)
    dws = [d.astype(w.dtype) for d, w in zip(dws, ws)]
    dbs = [d.astype(b.dtype) for d, b in zip(dbs, bs)]
    return denc, dws, dbs


_trunk_padded.defvjp(_trunk_padded_fwd, _trunk_padded_bwd)


# ---------------------------------------------------------------------------
# public entry


def on_tpu() -> bool:
    """True when the default device is TPU hardware.

    The axon relay registers its own platform name, so checking
    ``jax.default_backend() == 'tpu'`` misses tunneled TPUs — inspect the
    device kind instead."""
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in (getattr(d, "device_kind", "") or "")
    except Exception:  # pragma: no cover
        return False


def supports(cfg) -> bool:
    """True when the trunk architecture fits the kernel's layout contract."""
    H = cfg.layers_feat[0] if cfg.layers_feat else 0
    return (H % 128 == 0 and H > 0
            and all(d == H for d in cfg.layers_feat)
            and len(cfg.layers_feat) >= 2
            and len(cfg.skip) == 1 and 0 < cfg.skip[0] < len(cfg.layers_feat)
            and cfg.input_3d_dim <= IN_PAD)


def fused_trunk(enc: jnp.ndarray, feat_layers: list, skip: int,
                interpret: bool = False, tile: int | None = None,
                ckpt: int | None = None):
    """Run the trunk on [..., D] encoded points.

    feat_layers: list of {'w', 'b'} (bf16 or f32; cast to bf16 here), layer
    l==skip expecting input `concat([feat, enc])`, last layer emitting
    [density | H-dim feature].

    `tile` = points per grid step (default module TILE): larger tiles
    amortize per-step overhead and raise MXU occupancy at the cost of VMEM
    (weights + dW f32 + per-layer activations must fit).

    `ckpt` = activation checkpoint stride (default module TRUNK_CKPT /
    $POSEPROBE_TRUNK_CKPT): 0 full remat, 1 store all hidden activations,
    k>=2 store every k-th. Stored activations stream HBM<->VMEM through the
    Pallas grid pipeline (double-buffered block DMA overlapped with the MXU
    passes), trading remat matmuls for bandwidth.

    Returns (raw_density [...] f32, feat [..., H] bf16-valued f32-castable).
    """
    tile = tile or TILE
    ckpt = TRUNK_CKPT if ckpt is None else ckpt
    L = len(feat_layers)
    H = feat_layers[0]["w"].shape[1]
    lead = enc.shape[:-1]
    D = enc.shape[-1]
    x = enc.reshape(-1, D).astype(jnp.bfloat16)
    N = x.shape[0]
    # small batches: shrink the tile so padding waste stays bounded
    while tile > 256 and N <= tile // 2:
        tile //= 2
    N_pad = _cdiv(N, tile) * tile
    x = jnp.pad(x, ((0, N_pad - N), (0, IN_PAD - D)))

    ws, bs = [], []
    for l, layer in enumerate(feat_layers):
        w = layer["w"].astype(jnp.bfloat16)
        b = layer["b"].astype(jnp.bfloat16)[None, :]
        if l == 0:
            w = jnp.pad(w, ((0, IN_PAD - w.shape[0]), (0, 0)))
        elif l == skip:
            w = jnp.pad(w, ((0, H + IN_PAD - w.shape[0]), (0, 0)))
        if l == L - 1:
            # reorder [density | feat] -> [feat | density] so the kernel's two
            # outputs are lane-aligned slices of the last pre-activation
            w = jnp.concatenate([w[:, 1:], w[:, :1]], axis=1)
            b = jnp.concatenate([b[:, 1:], b[:, :1]], axis=1)
            w = jnp.pad(w, ((0, 0), (0, H + IN_PAD - w.shape[1])))
            b = jnp.pad(b, ((0, 0), (0, H + IN_PAD - b.shape[1])))
        ws.append(w)
        bs.append(b)

    feat_out, dens_out = _trunk_padded(x, ws, bs, skip, interpret, tile, ckpt)
    raw_density = dens_out[:N, 0].reshape(lead)
    feat = feat_out[:N].reshape(lead + (H,))
    return raw_density, feat
