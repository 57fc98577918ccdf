"""match_source=superglue integration smoke (round-4 verdict next #5).

Pretrained weights cannot exist here (zero egress), so these tests run the
FULL SuperPoint+SuperGlue JAX pipeline with random-init reference weights:
the matches are meaningless by construction, but the integration contract —
weight discovery, padding, confidence semantics, pack shapes, and the
downstream PnP/gate behavior under a weak matcher — must hold without a
crash. With real weights dropped into $POSEPROBE_SUPERGLUE_WEIGHTS the same
path becomes the reference's load-time flow (`lib/load_dtu.py:126-155`).
"""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SG_DIR = "/root/reference/external/SuperGlue"
_GEN = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                    "gen_superglue_random_weights.py")

pytestmark = pytest.mark.skipif(not os.path.isdir(_SG_DIR),
                                reason="reference SuperGlue source not mounted")


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    spec = importlib.util.spec_from_file_location("gen_sgw", _GEN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path_factory.mktemp("sgw"))
    mod.generate(out, seed=0)
    return out


def test_match_pair_superglue_pack_contract(weights_dir, monkeypatch):
    from poseprobe_tpu.pose_init import matching

    monkeypatch.setenv(matching.SUPERGLUE_WEIGHTS_ENV, weights_dir)
    # fresh cache: the module memoizes loaded weights across tests
    from poseprobe_tpu.pose_init import superglue
    superglue._CACHE.clear()
    rng = np.random.RandomState(0)
    img_i = rng.rand(64, 64, 3).astype(np.float32)
    img_j = rng.rand(64, 64, 3).astype(np.float32)
    mask_j = np.zeros((64, 64), np.float32)
    mask_j[16:48, 16:48] = 1.0
    pack = matching.match_pair(img_i, img_j, mask_j, max_matcher=128,
                               backend="superglue")
    assert pack.shape == (128, 5) and pack.dtype == np.float32
    valid = pack[:, 4] > 0
    if valid.any():
        # coordinates in-bounds, confidences in (0, 1], object-side
        # keypoints inside the mask
        assert (pack[valid, :4] >= -0.5).all()
        assert (pack[valid, 0] <= 63.5).all() and (pack[valid, 1] <= 63.5).all()
        assert (pack[valid, 4] <= 1.0).all()
        ys = np.clip(pack[valid, 1].astype(int), 0, 63)
        xs = np.clip(pack[valid, 0].astype(int), 0, 63)
        assert (mask_j[ys, xs] > 0).all()
    assert (pack[~valid] == 0).all()  # zero padding


@pytest.mark.slow
def test_synthetic_protocol_superglue_source(weights_dir, monkeypatch):
    """The protocol's data build with match_source='superglue' must produce
    well-formed packs and a loadable SceneData (a weak matcher is allowed to
    produce empty packs — the PnP fallback chain owns that case)."""
    from poseprobe_tpu.data.synthetic import make_synthetic_scene
    from poseprobe_tpu.pose_init import matching, superglue

    monkeypatch.setenv(matching.SUPERGLUE_WEIGHTS_ENV, weights_dir)
    superglue._CACHE.clear()
    data = make_synthetic_scene(n_train=3, n_test=2, H=64, W=64, seed=0,
                                match_source="superglue", texture="noise")
    assert data.obj_matches.shape[0] == 3
    assert data.scene_matches.shape == data.obj_matches.shape
    for packs in (data.obj_matches, data.scene_matches):
        conf = packs[..., 4]
        assert np.isfinite(packs).all()
        assert ((conf == 0) | ((conf > 0) & (conf <= 1.0))).all()
