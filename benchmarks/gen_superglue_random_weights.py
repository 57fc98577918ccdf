"""Generate RANDOM-init SuperPoint/SuperGlue weight files (npz).

The pretrained weights are git-LFS blobs absent from this snapshot (zero
egress), so every committed run uses the classical SIFT fallback. This tool
makes the `match_source=superglue` INTEGRATION path exercisable end-to-end
anyway (round-4 verdict next #5): instantiate the reference torch modules
with seeded random parameters (their `load_state_dict` suppressed — same
trick as tests/test_matcher_parity.py), export the state_dicts through
`pose_init.convert.save_npz`, and point $POSEPROBE_SUPERGLUE_WEIGHTS at the
output directory. Matching quality is then meaningless by construction —
the run proves padding/conf-semantics/pack-shapes and the PnP gate/rescue
behavior under a weak matcher, and keeps the pretrained path one env var
away.

Usage: python benchmarks/gen_superglue_random_weights.py --out /tmp/sgw
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

_SG_DIR = "/root/reference/external/SuperGlue"


def generate(out_dir: str, seed: int = 0) -> dict:
    """Write superpoint_v1.npz + superglue_indoor.npz; returns paths."""
    import torch

    from poseprobe_tpu.pose_init import convert

    if _SG_DIR not in sys.path:
        sys.path.insert(0, _SG_DIR)
    import models.superglue as ref_sg
    import models.superpoint as ref_sp

    def random_init(ctor, *args, s=0, **kw):
        torch.manual_seed(s)
        orig_lsd = torch.nn.Module.load_state_dict
        orig_load = torch.load
        torch.nn.Module.load_state_dict = lambda self, *a, **k: None
        torch.load = lambda *a, **k: {}
        try:
            return ctor(*args, **kw)
        finally:
            torch.nn.Module.load_state_dict = orig_lsd
            torch.load = orig_load

    os.makedirs(out_dir, exist_ok=True)
    sp = random_init(ref_sp.SuperPoint, {}, s=seed)
    sg = random_init(ref_sg.SuperGlue,
                     {"weights": "indoor", "sinkhorn_iterations": 20,
                      "match_threshold": 0.2, "max_matcher": 256}, s=seed + 1)
    paths = {}
    for stem, mod in (("superpoint_v1", sp), ("superglue_indoor", sg)):
        p = os.path.join(out_dir, stem + ".npz")
        convert.save_npz(p, mod.state_dict())
        paths[stem] = p
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/superglue_random_weights")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    paths = generate(args.out, args.seed)
    for stem, p in paths.items():
        print(f"[gen] {stem}: {p}")
    print(f"export POSEPROBE_SUPERGLUE_WEIGHTS={args.out}")


if __name__ == "__main__":
    main()
