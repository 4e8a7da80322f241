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
