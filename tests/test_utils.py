"""Utility tests: PLY roundtrip, misc helpers, config system, profiling."""

import os

import numpy as np
import jax.numpy as jnp

from fateavatar_tpu.render.ply import load_ply, save_ply
from fateavatar_tpu.render.splats import make_gaussians
from fateavatar_tpu.utils import misc
from fateavatar_tpu.utils.config import Config, load_config


class TestPly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 20
        g = make_gaussians(
            xyz=rng.normal(size=(n, 3)),
            scaling=rng.normal(size=(n, 3)),
            rotation=rng.normal(size=(n, 4)),
            opacity=rng.normal(size=(n, 1)),
            features_dc=rng.normal(size=(n, 1, 3)),
            features_rest=rng.normal(size=(n, 3, 3)).astype(np.float32),
            sh_degree=1,
        )
        g = g.replace(alive=g.alive.at[15:].set(False))
        path = str(tmp_path / "test.ply")
        written = save_ply(path, g)
        assert written == 15
        g2 = load_ply(path)
        np.testing.assert_allclose(np.asarray(g2.xyz), np.asarray(g.xyz[:15]),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g2.features_rest), np.asarray(g.features_rest[:15]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g2.rotation), np.asarray(g.rotation[:15]), atol=1e-6
        )
        assert g2.sh_degree == 1

    def test_load_with_capacity_padding(self, tmp_path):
        rng = np.random.default_rng(1)
        g = make_gaussians(
            xyz=rng.normal(size=(5, 3)), scaling=rng.normal(size=(5, 3)),
            rotation=rng.normal(size=(5, 4)), opacity=rng.normal(size=(5, 1)),
            features_dc=rng.normal(size=(5, 1, 3)),
        )
        path = str(tmp_path / "cap.ply")
        save_ply(path, g)
        g2 = load_ply(path, capacity=16)
        assert g2.capacity == 16
        assert int(jnp.sum(g2.alive)) == 5


class TestMisc:
    def test_colorize(self):
        heat = misc.colorize_weights_map(np.linspace(0, 1, 16).reshape(4, 4))
        assert heat.shape == (4, 4, 3)
        assert heat.min() >= 0 and heat.max() <= 1

    def test_file_backup(self, tmp_path):
        misc.file_backup(str(tmp_path), source_dirs=("configs",),
                         repo_root=os.path.dirname(os.path.dirname(__file__)))
        assert os.path.exists(tmp_path / "archive" / "configs" / "fateavatar.yaml")

    def test_bg_color(self):
        np.testing.assert_allclose(np.asarray(misc.get_bg_color("white")), 1.0)
        np.testing.assert_allclose(np.asarray(misc.get_bg_color("black")), 0.0)


class TestConfig:
    def test_defaults_and_overrides(self):
        cfg = load_config(None, ["training.scaling_lr=0.1", "model.tex_size=64"])
        assert cfg.training.scaling_lr == 0.1
        assert cfg.model.tex_size == 64

    def test_unknown_key_raises(self, tmp_path):
        p = tmp_path / "bad.yaml"
        p.write_text("bogus_section:\n  x: 1\n")
        import pytest

        with pytest.raises(KeyError):
            load_config(str(p))

    def test_yaml_roundtrip(self, tmp_path):
        cfg = load_config("configs/fateavatar.yaml")
        assert cfg.model.tex_size == 256
        assert cfg.training.max_points_num == 200000


class TestProfiling:
    def test_phase_timer(self):
        from fateavatar_tpu.utils.profiling import PhaseTimer

        t = PhaseTimer()
        with t.phase("a"):
            pass
        assert "a" in t.report()

    def test_time_fn(self):
        import jax
        from fateavatar_tpu.utils.profiling import time_fn

        f = jax.jit(lambda x: x * 2)
        dt = time_fn(f, jnp.ones(16), warmup=1, iters=3)
        assert dt > 0


class TestDSSIM:
    def test_separable_matches_dense_2d_window(self):
        """The two-pass 1-D formulation (and the 15-channel batched conv)
        must equal a dense 11x11 2-D Gaussian-window SSIM reference
        (tools/loss_utils/dssim.py:28-58 semantics)."""
        import jax
        import jax.numpy as jnp

        from fateavatar_tpu.train.losses import _gaussian_window_1d, d_ssim

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
        b = jnp.clip(a + 0.1 * jnp.asarray(rng.random((32, 32, 3)),
                                           jnp.float32), 0, 1)

        g1 = np.asarray(_gaussian_window_1d(11))
        w2d = np.outer(g1, g1)
        k = jnp.asarray(
            np.broadcast_to(w2d[None, None], (3, 1, 11, 11)), jnp.float32)

        def conv2d(im):
            return jax.lax.conv_general_dilated(
                im.transpose(2, 0, 1)[None], k, (1, 1), "SAME",
                feature_group_count=3,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        mu1, mu2 = conv2d(a), conv2d(b)
        s1 = conv2d(a * a) - mu1 * mu1
        s2 = conv2d(b * b) - mu2 * mu2
        s12 = conv2d(a * b) - mu1 * mu2
        C1, C2 = 0.01**2, 0.03**2
        ssim = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
            (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2))
        expected = 1.0 - float(jnp.mean(ssim))

        got = float(d_ssim(a, b))
        assert abs(got - expected) < 1e-5, (got, expected)
        assert float(d_ssim(a, a)) < 1e-6  # identical images -> 0
