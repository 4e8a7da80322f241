"""Tests for the native GFPGAN-clean face restorer (completion stage ④)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.completion.restoration import (
    GFPGANConfig, GFPGANRestorer, gfpgan_random_params, gfpgan_restore,
    load_gfpgan_from_torch, tiny_gfpgan_config,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_gfpgan_config()
    params = gfpgan_random_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestGFPGAN:
    def test_restore_shapes(self, tiny):
        cfg, p = tiny
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (2, cfg.out_size, cfg.out_size, 3)) * 2 - 1
        y = gfpgan_restore(p, cfg, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_deterministic(self, tiny):
        cfg, p = tiny
        x = jax.random.uniform(jax.random.PRNGKey(2),
                               (1, cfg.out_size, cfg.out_size, 3)) * 2 - 1
        a = gfpgan_restore(p, cfg, x)
        b = gfpgan_restore(p, cfg, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restorer_plugin_resizes(self, tiny):
        cfg, p = tiny
        restorer = GFPGANRestorer(p, cfg)
        crops = np.random.RandomState(0).rand(3, 24, 24, 3).astype(np.float32)
        out = restorer(crops)
        assert out.shape == crops.shape
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_converter_roundtrip(self, tiny, tmp_path):
        torch = pytest.importorskip("torch")
        cfg, p = tiny
        sd = {"params_ema": {k: torch.from_numpy(np.asarray(v))
                             for k, v in p.items()}}
        path = str(tmp_path / "gfpgan.pth")
        torch.save(sd, path)
        loaded, _, unused = load_gfpgan_from_torch(path, cfg)
        assert set(loaded) == set(p)
        x = jax.random.uniform(jax.random.PRNGKey(3),
                               (1, cfg.out_size, cfg.out_size, 3)) * 2 - 1
        np.testing.assert_allclose(
            np.asarray(gfpgan_restore(p, cfg, x)),
            np.asarray(gfpgan_restore(loaded, cfg, x)), atol=1e-6)

    def test_full_size_config_channels(self):
        cfg = GFPGANConfig()
        # public v1.3 checkpoint dimensions
        assert cfg.num_latent == 16
        assert cfg.decoder_channels(512) == 64
        assert cfg.unet_channels(512) == 32
        assert cfg.decoder_channels(64) == 512
        assert cfg.unet_channels(64) == 256
