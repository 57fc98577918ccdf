"""Random-weights numerical parity: JAX matchers vs the reference torch models.

No pretrained weights exist in this environment (git-LFS blobs are absent from
the snapshot), but correctness doesn't need them: instantiate the reference
torch modules (`/root/reference/external/SuperGlue/models/`) with *random*
(seeded) parameters, export the state_dict, load it into the JAX forwards, and
assert output agreement. A VGG16-LPIPS torch mirror (torchvision `features`
indices) plays the same role for the LPIPS forward.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SG_DIR = "/root/reference/external/SuperGlue"
pytestmark = pytest.mark.skipif(not os.path.isdir(_SG_DIR),
                                reason="reference SuperGlue source not mounted")


def _import_ref_models():
    if _SG_DIR not in sys.path:
        sys.path.insert(0, _SG_DIR)
    # the reference modules load LFS weight blobs in __init__; neutralize
    import models.superglue as ref_sg
    import models.superpoint as ref_sp
    return ref_sp, ref_sg


def _random_init(module_ctor, *args, seed=0, **kwargs):
    """Instantiate a reference module with load_state_dict suppressed."""
    torch.manual_seed(seed)
    orig_lsd = torch.nn.Module.load_state_dict
    orig_load = torch.load
    torch.nn.Module.load_state_dict = lambda self, *a, **k: None
    torch.load = lambda *a, **k: {}
    try:
        mod = module_ctor(*args, **kwargs)
    finally:
        torch.nn.Module.load_state_dict = orig_lsd
        torch.load = orig_load
    mod.eval()
    return mod


def _to_numpy_sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


class TestSuperPointParity:
    @pytest.fixture(scope="class")
    def setup(self):
        ref_sp, _ = _import_ref_models()
        model = _random_init(ref_sp.SuperPoint,
                             {"keypoint_threshold": 0.0, "max_keypoints": 64,
                              "nms_radius": 2})
        rng = np.random.RandomState(0)
        img = rng.rand(64, 80).astype(np.float32)
        return ref_sp, model, img

    def test_dense_heatmap_and_descriptor_map(self, setup):
        """Encoder + heads agree densely (pre-NMS) to float32 tolerance."""
        ref_sp, model, img = setup
        t = torch.from_numpy(img)[None, None]
        with torch.no_grad():
            x = model.relu(model.conv1a(t)); x = model.relu(model.conv1b(x)); x = model.pool(x)
            x = model.relu(model.conv2a(x)); x = model.relu(model.conv2b(x)); x = model.pool(x)
            x = model.relu(model.conv3a(x)); x = model.relu(model.conv3b(x)); x = model.pool(x)
            x = model.relu(model.conv4a(x)); x = model.relu(model.conv4b(x))
            cPa = model.relu(model.convPa(x))
            scores = torch.nn.functional.softmax(model.convPb(cPa), 1)[:, :-1]
            b, _, h, w = scores.shape
            heat_t = scores.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
            heat_t = heat_t.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)[0].numpy()
            heat_t = ref_sp.simple_nms(torch.from_numpy(heat_t)[None], 2)[0].numpy()
            cDa = model.relu(model.convDa(x))
            dmap_t = torch.nn.functional.normalize(model.convDb(cDa), p=2, dim=1)
            dmap_t = dmap_t[0].permute(1, 2, 0).numpy()

        import jax.numpy as jnp

        from poseprobe_tpu.pose_init import superglue as jx

        sd = _to_numpy_sd(model)
        # reproduce the JAX intermediate tensors via the public forward pieces
        xj = jnp.asarray(img)[..., None]
        import jax
        relu = jax.nn.relu
        for n in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                  "conv4a", "conv4b"):
            xj = relu(jx._conv(xj, sd[f"{n}.weight"], sd[f"{n}.bias"]))
            if n in ("conv1b", "conv2b", "conv3b"):
                xj = jx._maxpool2(xj)
        cpa = relu(jx._conv(xj, sd["convPa.weight"], sd["convPa.bias"]))
        sc = jax.nn.softmax(jx._conv(cpa, sd["convPb.weight"], sd["convPb.bias"]), -1)[..., :64]
        hh, ww = sc.shape[:2]
        heat_j = np.asarray(sc.reshape(hh, ww, 8, 8).transpose(0, 2, 1, 3).reshape(hh * 8, ww * 8))
        cda = relu(jx._conv(xj, sd["convDa.weight"], sd["convDa.bias"]))
        dmap_j = jx._conv(cda, sd["convDb.weight"], sd["convDb.bias"])
        dmap_j = np.asarray(dmap_j / (jnp.linalg.norm(dmap_j, axis=-1, keepdims=True) + 1e-8))

        # compare pre-NMS maps (heat_t already NMS'd; redo on the JAX side below)
        np.testing.assert_allclose(dmap_j, dmap_t, atol=2e-5)

        # full keypoint path: our fixed-K output must reproduce the torch set
        kpts_j, scores_j, desc_j = jx.superpoint_forward(
            sd, jnp.asarray(img), nms_radius=2, keypoint_threshold=0.0,
            max_keypoints=64)
        with torch.no_grad():
            out_t = model({"image": t})
        k_t = out_t["keypoints"][0].numpy()
        s_t = out_t["scores"][0].numpy()
        # NOTE the reference's `sample_descriptors` version check
        # (`int(torch.__version__[2]) > 2`, superpoint.py:87) misparses
        # torch >= 2.10 ("2.13"[2] == '1') and silently flips grid_sample to
        # align_corners=False — not the semantics the pretrained weights were
        # trained with (torch 1.x => True). Our JAX forward implements the
        # intended align_corners=True; compare against an explicit torch
        # grid_sample(align_corners=True) with the reference's coordinates.
        with torch.no_grad():
            kk = torch.from_numpy(k_t).clone()
            s8 = 8.0
            hd_, wd_ = dmap_t.shape[0], dmap_t.shape[1]
            kk = kk - s8 / 2 + 0.5
            kk = kk / torch.tensor([(wd_ * s8 - s8 / 2 - 0.5), (hd_ * s8 - s8 / 2 - 0.5)])
            kk = kk * 2 - 1
            dmap_tt = torch.from_numpy(dmap_t).permute(2, 0, 1)[None]
            d_ref = torch.nn.functional.grid_sample(
                dmap_tt, kk.view(1, 1, -1, 2), mode="bilinear", align_corners=True)
            d_ref = torch.nn.functional.normalize(d_ref.reshape(1, 256, -1), p=2, dim=1)
        d_t = d_ref[0].numpy().T  # [K, 256]
        K = min(len(k_t), 64)
        rows_t = {tuple(map(int, k)) for k in k_t[:K]}
        rows_j = {tuple(map(int, k)) for k in np.asarray(kpts_j)[:K]}
        assert rows_t == rows_j
        # align orderings by keypoint coords for score/descriptor comparison
        order_t = np.lexsort((k_t[:K, 0], k_t[:K, 1]))
        kj = np.asarray(kpts_j)[:K]
        order_j = np.lexsort((kj[:, 0], kj[:, 1]))
        np.testing.assert_allclose(np.asarray(scores_j)[:K][order_j],
                                   s_t[:K][order_t], atol=1e-5)
        np.testing.assert_allclose(np.asarray(desc_j)[:K][order_j],
                                   d_t[:K][order_t], atol=1e-4)


class TestSuperGlueParity:
    def test_matches_and_scores(self, tmp_path):
        _, ref_sg = _import_ref_models()
        model = _random_init(ref_sg.SuperGlue,
                             {"weights": "indoor", "sinkhorn_iterations": 20,
                              "match_threshold": 0.2, "max_matcher": 64},
                             seed=1)
        rng = np.random.RandomState(2)
        N0, N1 = 48, 40
        H, W = 60, 72
        k0 = (rng.rand(N0, 2) * [W - 1, H - 1]).astype(np.float32)
        k1 = (rng.rand(N1, 2) * [W - 1, H - 1]).astype(np.float32)
        s0 = rng.rand(N0).astype(np.float32)
        s1 = rng.rand(N1).astype(np.float32)
        d0 = rng.randn(256, N0).astype(np.float32)
        d1 = rng.randn(256, N1).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=0, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=0, keepdims=True)

        data = {
            "descriptors0": torch.from_numpy(d0)[None],
            "descriptors1": torch.from_numpy(d1)[None],
            "keypoints0": torch.from_numpy(k0)[None],
            "keypoints1": torch.from_numpy(k1)[None],
            "scores0": torch.from_numpy(s0)[None],
            "scores1": torch.from_numpy(s1)[None],
            "image0": torch.zeros(1, 1, H, W),
            "image1": torch.zeros(1, 1, H, W),
        }
        with torch.no_grad():
            out = model(data)
        m_t = out["matches0"][0].numpy()
        ms_t = out["matching_scores0"][0].numpy()

        import jax.numpy as jnp

        from poseprobe_tpu.pose_init import superglue as jx

        # round-trip the torch state_dict through the converter file format
        # (`pose_init/convert.py`): the JAX forward consumes the .npz bundle
        from poseprobe_tpu.pose_init import convert

        npz_path = str(tmp_path / "superglue_random.npz")
        convert.save_npz(npz_path, model.state_dict())
        sd = convert.load_npz(npz_path)
        ref_sd = _to_numpy_sd(model)
        assert set(sd) == set(ref_sd)
        for k in sd:
            np.testing.assert_array_equal(sd[k], ref_sd[k])
        m_j, ms_j = jx.superglue_forward(
            sd, jnp.asarray(k0), jnp.asarray(s0), jnp.asarray(d0.T),
            jnp.asarray(k1), jnp.asarray(s1), jnp.asarray(d1.T),
            (H, W), sinkhorn_iterations=20, match_threshold=0.2)
        np.testing.assert_allclose(np.asarray(ms_j), ms_t, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(m_j), m_t)


class TestLPIPSParity:
    def _torch_vgg16_features(self, seed=0):
        """VGG16 `features` stack with torchvision's sequential indices."""
        torch.manual_seed(seed)
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
                layers.append(torch.nn.ReLU())
                in_c = v
        return torch.nn.Sequential(*layers).eval()

    def test_lpips_forward_matches_torch_mirror(self, tmp_path, monkeypatch):
        from poseprobe_tpu.eval import metrics as jm

        vgg = self._torch_vgg16_features()
        sd = {f"features.{i}": m for i, m in enumerate(vgg)}
        blobs = {}
        for i, m in enumerate(vgg):
            if isinstance(m, torch.nn.Conv2d):
                blobs[f"features.{i}.weight"] = m.weight.detach().numpy()
                blobs[f"features.{i}.bias"] = m.bias.detach().numpy()
        rng = np.random.RandomState(0)
        for li, c in enumerate((64, 128, 256, 512, 512)):
            blobs[f"lin{li}.model.1.weight"] = rng.rand(1, c, 1, 1).astype(np.float32)
        path = tmp_path / "lpips.npz"
        np.savez(path, **blobs)
        monkeypatch.setenv("POSEPROBE_LPIPS_WEIGHTS", str(path))

        img0 = rng.rand(32, 32, 3).astype(np.float32)
        img1 = rng.rand(32, 32, 3).astype(np.float32)
        got = jm.lpips_fn(img0, img1)

        # torch mirror of the LPIPS-vgg forward (lpips package semantics:
        # scaling layer, relu-block features, unit-normalize, lin weights,
        # spatial mean)
        def norm_t(x):
            x = x * 2.0 - 1.0
            mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
            std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
            return (x - mean) / std

        slices = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))
        with torch.no_grad():
            f0, f1 = [], []
            h0 = norm_t(torch.from_numpy(img0).permute(2, 0, 1)[None])
            h1 = norm_t(torch.from_numpy(img1).permute(2, 0, 1)[None])
            for (a, b) in slices:
                for i in range(a, b):
                    h0 = sd[f"features.{i}"](h0)
                    h1 = sd[f"features.{i}"](h1)
                f0.append(h0)
                f1.append(h1)
            want = 0.0
            for li, (a, b) in enumerate(zip(f0, f1)):
                a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
                b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
                diff = (a - b) ** 2
                lin = torch.from_numpy(blobs[f"lin{li}.model.1.weight"][:, :, 0, 0])
                want = want + (diff[0] * lin[0][:, None, None]).sum(0).mean()
        np.testing.assert_allclose(got, float(want), rtol=2e-4)


class TestVGGFeaturesPath:
    def test_get_multi_features_vgg_path(self, tmp_path, monkeypatch):
        """The weights-gated VGG feature extractor runs and matches a torch
        mirror on the first conv block (role of `VGGLoss.get_multi_features`,
        lib/vgg_loss.py)."""
        rng = np.random.RandomState(1)
        blobs = {}
        torch.manual_seed(3)
        convs = {}
        for i, (cin, cout) in {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128)}.items():
            m = torch.nn.Conv2d(cin, cout, 3, padding=1)
            convs[i] = m
            blobs[f"features.{i}.weight"] = m.weight.detach().numpy()
            blobs[f"features.{i}.bias"] = m.bias.detach().numpy()
        for li, c in enumerate((64, 128, 256, 512, 512)):
            blobs[f"lin{li}.model.1.weight"] = rng.rand(1, c, 1, 1).astype(np.float32)
        path = tmp_path / "lpips.npz"
        np.savez(path, **blobs)
        monkeypatch.setenv("POSEPROBE_LPIPS_WEIGHTS", str(path))

        from poseprobe_tpu.eval.vgg_features import features_available, get_multi_features

        assert features_available()
        imgs = rng.rand(2, 16, 16, 3).astype(np.float32)
        feats = get_multi_features(imgs, layers=2)
        assert feats.shape == (2, 16, 16, 64 + 128)
        assert np.isfinite(feats).all()
        # first block parity vs torch (pre-pool, full res)
        with torch.no_grad():
            h = torch.from_numpy(imgs).permute(0, 3, 1, 2) * 2.0 - 1.0
            h = torch.relu(convs[0](h))
            h = torch.relu(convs[2](h))
            want = h.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(feats[..., :64], want, atol=2e-4)
        # second block parity: maxpool -> convs 5,7 -> bilinear upsample back
        # to input res (jax.image.resize "bilinear" == torch align_corners=False)
        with torch.no_grad():
            h = torch.nn.functional.max_pool2d(h, 2, 2)
            h = torch.relu(convs[5](h))
            h = torch.relu(convs[7](h))
            h = torch.nn.functional.interpolate(
                h, size=(16, 16), mode="bilinear", align_corners=False)
            want2 = h.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(feats[..., 64:], want2, atol=2e-3)


class TestConverterCLI:
    def test_pth_to_npz_cli_and_loader(self, tmp_path, monkeypatch):
        """`python -m poseprobe_tpu.pose_init.convert --pth ...` round-trip,
        plus `_load_weights` preferring the converted .npz (torch-free path)."""
        from poseprobe_tpu.pose_init import convert, superglue

        sd = {"conv1a.weight": torch.randn(64, 1, 3, 3), "conv1a.bias": torch.randn(64)}
        pth = tmp_path / "superpoint_v1.pth"
        torch.save(sd, str(pth))
        rc = convert.main(["--pth-dir", str(tmp_path), "--out-dir", str(tmp_path)])
        assert rc == 0
        npz = tmp_path / "superpoint_v1.npz"
        assert npz.exists()
        loaded = convert.load_npz(str(npz))
        np.testing.assert_array_equal(loaded["conv1a.weight"], sd["conv1a.weight"].numpy())

        monkeypatch.setenv(superglue.SUPERGLUE_WEIGHTS_ENV, str(tmp_path))
        superglue._CACHE.clear()
        cache = superglue._load_weights()
        assert superglue._find(str(tmp_path), "superpoint_v1").endswith(".npz")
        np.testing.assert_array_equal(cache["sp"]["conv1a.bias"], sd["conv1a.bias"].numpy())
        superglue._CACHE.clear()
