"""Native LPIPS: structure, converter, and a torch-computed oracle.

The oracle re-implements the published LPIPS forward with torch.nn.functional
ops (an independent execution path), so conv stride/pad and pool semantics of
the JAX port are pinned numerically — not just by name/shape."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fateavatar_tpu.train.lpips import (
    LpipsParams, load_lpips_from_torch, load_lpips_npz, lpips_distance,
    lpips_random_params, save_lpips_npz,
)

torch = pytest.importorskip("torch")


def _rand_imgs(seed=0, res=64):
    rng = np.random.default_rng(seed)
    a = rng.random((res, res, 3)).astype(np.float32)
    b = rng.random((res, res, 3)).astype(np.float32)
    return a, b


class TestLpipsBasics:
    @pytest.mark.parametrize("backbone", ["alex", "vgg"])
    def test_zero_self_distance_and_positive(self, backbone):
        params = lpips_random_params(jax.random.PRNGKey(0), backbone)
        a, b = _rand_imgs()
        d_self = float(lpips_distance(params, a, a))
        d_ab = float(lpips_distance(params, a, b))
        assert abs(d_self) < 1e-6
        assert d_ab > 0

    def test_npz_roundtrip(self, tmp_path):
        params = lpips_random_params(jax.random.PRNGKey(1), "alex")
        p = str(tmp_path / "lpips.npz")
        save_lpips_npz(p, params)
        back = load_lpips_npz(p)
        a, b = _rand_imgs(2)
        np.testing.assert_allclose(
            float(lpips_distance(params, a, b)),
            float(lpips_distance(back, a, b)), rtol=1e-6)

    def test_batched_matches_single(self):
        params = lpips_random_params(jax.random.PRNGKey(2), "alex")
        a, b = _rand_imgs(3)
        c, d = _rand_imgs(4)
        batch = lpips_distance(params, np.stack([a, c]), np.stack([b, d]))
        np.testing.assert_allclose(
            np.asarray(batch),
            [float(lpips_distance(params, a, b)),
             float(lpips_distance(params, c, d))], rtol=1e-4)


def _alex_state_dict(rng):
    """Synthetic full LPIPS(alex) state dict with the real key layout
    (lpips package: net.slice{k}.{featidx}.weight + lin{k}.model.1.weight)."""
    shapes = [  # (slice, feature idx, out, in, k)
        (1, 0, 64, 3, 11), (2, 3, 192, 64, 5), (3, 6, 384, 192, 3),
        (4, 8, 256, 384, 3), (5, 10, 256, 256, 3),
    ]
    sd = {}
    for s, i, o, c, k in shapes:
        sd[f"net.slice{s}.{i}.weight"] = torch.tensor(
            rng.normal(size=(o, c, k, k)).astype(np.float32) * 0.05)
        sd[f"net.slice{s}.{i}.bias"] = torch.tensor(
            rng.normal(size=(o,)).astype(np.float32) * 0.01)
    for k_i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{k_i}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))
    return sd


def _torch_lpips_alex(sd, img0, img1):
    """Independent torch re-execution of LPIPS(alex) (richzhang
    PerceptualSimilarity v0.1 forward)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        x = F.relu(F.conv2d(x, sd["net.slice1.0.weight"],
                            sd["net.slice1.0.bias"], stride=4, padding=2))
        out.append(x)
        x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, sd["net.slice2.3.weight"],
                            sd["net.slice2.3.bias"], padding=2))
        out.append(x)
        x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, sd["net.slice3.6.weight"],
                            sd["net.slice3.6.bias"], padding=1))
        out.append(x)
        x = F.relu(F.conv2d(x, sd["net.slice4.8.weight"],
                            sd["net.slice4.8.bias"], padding=1))
        out.append(x)
        x = F.relu(F.conv2d(x, sd["net.slice5.10.weight"],
                            sd["net.slice5.10.bias"], padding=1))
        out.append(x)
        return out

    def unit(x):
        return x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    t0 = torch.tensor(img0).permute(2, 0, 1)[None] * 2 - 1
    t1 = torch.tensor(img1).permute(2, 0, 1)[None] * 2 - 1
    total = 0.0
    for k_i, (f0, f1) in enumerate(zip(feats(t0), feats(t1))):
        d = (unit(f0) - unit(f1)).pow(2)
        lin = sd[f"lin{k_i}.model.1.weight"]
        total = total + (d * lin).sum(1, keepdim=True).mean((2, 3))
    return float(total)


class TestLpipsTorchOracle:
    def test_converter_and_forward_match_torch(self, tmp_path):
        rng = np.random.default_rng(7)
        sd = _alex_state_dict(rng)
        path = str(tmp_path / "lpips_alex_full.pth")
        torch.save(sd, path)

        params = load_lpips_from_torch(path, backbone="alex")
        assert isinstance(params, LpipsParams)
        assert len(params.convs) == 5 and len(params.lins) == 5

        a, b = _rand_imgs(11, res=96)
        got = float(lpips_distance(params, a, b))
        want = _torch_lpips_alex(sd, a, b)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)

    def test_lin_only_requires_backbone(self, tmp_path):
        rng = np.random.default_rng(8)
        sd = {k: v for k, v in _alex_state_dict(rng).items()
              if k.startswith("lin")}
        path = str(tmp_path / "lpips_lins.pth")
        torch.save(sd, path)
        with pytest.raises(ValueError, match="backbone_path"):
            load_lpips_from_torch(path, backbone="alex")

    def test_lin_only_plus_torchvision_backbone(self, tmp_path):
        rng = np.random.default_rng(9)
        full = _alex_state_dict(rng)
        lins = {k: v for k, v in full.items() if k.startswith("lin")}
        # torchvision alexnet layout: features.{0,3,6,8,10}.weight
        tv = {}
        for (s, i) in ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10)):
            tv[f"features.{i}.weight"] = full[f"net.slice{s}.{i}.weight"]
            tv[f"features.{i}.bias"] = full[f"net.slice{s}.{i}.bias"]
        p1 = str(tmp_path / "lins.pth")
        p2 = str(tmp_path / "alexnet.pth")
        torch.save(lins, p1)
        torch.save(tv, p2)
        params = load_lpips_from_torch(p1, backbone="alex", backbone_path=p2)
        a, b = _rand_imgs(12)
        want = _torch_lpips_alex(full, a, b)
        np.testing.assert_allclose(
            float(lpips_distance(params, a, b)), want, rtol=2e-4, atol=1e-6)

    def test_meter_activation(self, tmp_path):
        from fateavatar_tpu.train.metrics import LPIPSMeter

        rng = np.random.default_rng(10)
        path = str(tmp_path / "full.pth")
        torch.save(_alex_state_dict(rng), path)
        m = LPIPSMeter(weights_path=path)
        assert m.available
        a, b = _rand_imgs(13)
        m.update(a, b)
        assert np.isfinite(m.measure())
        # no weights -> disabled, NaN current value
        m2 = LPIPSMeter()
        assert not m2.available
        m2.update(a, b)
        assert np.isnan(m2.V_cur)