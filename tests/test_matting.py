"""Tests for the native MODNet matting port (completion stage ⑧)."""

import numpy as np
import jax
import pytest

from fateavatar_tpu.completion.matting import (
    MODNetMatting, load_modnet_from_torch, modnet_matte,
    modnet_random_params, torso_boundary,
)


@pytest.fixture(scope="module")
def params():
    return modnet_random_params(jax.random.PRNGKey(0))


class TestMODNet:
    def test_matte_shape_and_range(self, params):
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        m = modnet_matte(params, img)
        assert m.shape == (1, 64, 64, 1)
        a = np.asarray(m)
        assert np.isfinite(a).all()
        assert a.min() >= 0.0 and a.max() <= 1.0

    def test_plugin_pads_odd_sizes(self, params):
        matting = MODNetMatting(params)
        img = np.random.RandomState(0).rand(50, 70, 3).astype(np.float32)
        m = matting(img)
        assert m.shape == (50, 70)

    def test_converter_roundtrip(self, params, tmp_path):
        torch = pytest.importorskip("torch")
        sd = {"module." + k: torch.from_numpy(np.array(v))
              for k, v in params.items()}
        path = str(tmp_path / "modnet.ckpt")
        torch.save(sd, path)
        loaded = load_modnet_from_torch(path)
        assert set(loaded) == set(params)
        img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        np.testing.assert_allclose(
            np.asarray(modnet_matte(params, img)),
            np.asarray(modnet_matte(loaded, img)), atol=1e-6)

    def test_torso_boundary(self):
        matte = np.zeros((8, 4), np.float32)
        matte[2:6, 1] = 1.0     # column 1 foreground rows 2..5
        matte[0:3, 3] = 1.0     # column 3 foreground rows 0..2
        b = torso_boundary(matte)
        assert b[0] == -1 and b[2] == -1
        assert b[1] == 5 and b[3] == 2

    def test_param_count_realistic(self, params):
        n = sum(int(np.prod(v.shape)) for v in params.values())
        # MODNet is ~6.5M params; the exact-name random init must be close
        assert 5_000_000 < n < 8_000_000
