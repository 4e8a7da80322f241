"""Tests for the JAX EG3D-family generator + PTI (completion stage ⑤/⑥).

Covers: primitive-layer correctness (grouped modulated conv vs per-sample
loop, FIR upsampling shape/mass), full-synthesis shapes on tri-plane and
tri-grid configs, gradient flow, W-projection loss descent, converter
round-trip through an .npz, and the provider protocol end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.completion.eg3d.networks import (
    EG3DConfig, tiny_test_config, eg3d_random_params, mapping_network,
    synthesis, synthesis_backbone, render_full, camera_rays, sample_planes,
    _modulated_conv2d, _upsample2x, eg3d_camera_label,
)
from fateavatar_tpu.completion.eg3d.pti import (
    PTIConfig, compute_w_stats, project_w, pti_finetune,
)
from fateavatar_tpu.completion.eg3d.convert import (
    load_eg3d_from_torch, infer_config,
)
from fateavatar_tpu.completion.eg3d.provider import (
    EG3DPseudoProvider, EG3DProviderConfig,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    params = eg3d_random_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _frontal_label(cfg):
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -2.7  # camera on -z looking at origin along +z
    return jnp.asarray(eg3d_camera_label(c2w))


class TestPrimitives:
    def test_upsample2x_shape_and_mass(self):
        x = jnp.ones((1, 8, 8, 3))
        y = _upsample2x(x)
        assert y.shape == (1, 16, 16, 3)
        # gain-4 FIR on a constant image keeps the value in the interior
        np.testing.assert_allclose(np.asarray(y[0, 4:12, 4:12, 0]), 1.0,
                                   atol=1e-5)

    def test_modulated_conv_matches_per_sample(self):
        key = jax.random.PRNGKey(1)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (3, 6, 6, 4))
        w = jax.random.normal(k2, (5, 4, 3, 3))
        styles = jax.random.normal(k3, (3, 4)) + 1.0
        batched = _modulated_conv2d(x, w, styles, demodulate=True)
        singles = jnp.concatenate([
            _modulated_conv2d(x[i:i + 1], w, styles[i:i + 1], demodulate=True)
            for i in range(3)
        ])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(singles),
                                   atol=1e-4)

    def test_camera_rays_point_at_lookat(self):
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -2.7
        intr = jnp.asarray([[4.2647, 0, 0.5], [0, 4.2647, 0.5], [0, 0, 1]],
                           jnp.float32)
        o, d = camera_rays(jnp.asarray(c2w), intr, 4)
        assert o.shape == (16, 3) and d.shape == (16, 3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1),
                                   1.0, atol=1e-5)
        # central rays roughly towards +z (origin at z=-2.7 looking at 0)
        assert np.asarray(d)[:, 2].mean() > 0.9


class TestSynthesis:
    def test_mapping_shapes(self, tiny):
        cfg, p = tiny
        z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.z_dim))
        c = jnp.tile(_frontal_label(cfg)[None], (2, 1))
        ws = mapping_network(p, cfg, z, c)
        assert ws.shape == (2, cfg.num_ws, cfg.w_dim)

    def test_backbone_planes(self, tiny):
        cfg, p = tiny
        ws = jnp.zeros((1, cfg.num_ws, cfg.w_dim))
        planes = synthesis_backbone(p, cfg, ws)
        assert planes.shape == (1, cfg.backbone_resolution,
                                cfg.backbone_resolution,
                                cfg.backbone_img_channels)
        assert np.isfinite(np.asarray(planes)).all()

    def test_full_render_shapes(self, tiny):
        cfg, p = tiny
        z = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.z_dim))
        c = _frontal_label(cfg)[None]
        out = render_full(p, cfg, z, c)
        assert out["image"].shape == (1, cfg.sr_resolution,
                                      cfg.sr_resolution, 3)
        assert out["image_raw"].shape == (1, cfg.neural_resolution,
                                          cfg.neural_resolution, 3)
        assert np.isfinite(np.asarray(out["image"])).all()

    def test_trigrid_depth(self):
        cfg = EG3DConfig(
            z_dim=16, w_dim=16, num_mapping_layers=2, backbone_resolution=16,
            plane_channels=4, triplane_depth=3, channel_base=256,
            channel_max=32, decoder_hidden=8, decoder_out=4,
            neural_resolution=8, depth_resolution=6,
            depth_resolution_importance=6, sr_resolution=16, sr_channels=8,
        )
        p = eg3d_random_params(jax.random.PRNGKey(4), cfg)
        coords = jax.random.normal(jax.random.PRNGKey(5), (10, 3)) * 0.3
        planes = jnp.zeros((cfg.backbone_resolution, cfg.backbone_resolution,
                            cfg.backbone_img_channels))
        feats = sample_planes(cfg, planes, coords)
        assert feats.shape == (10, 3, cfg.plane_channels)
        out = render_full(p, cfg,
                          jax.random.normal(jax.random.PRNGKey(6),
                                            (1, cfg.z_dim)),
                          _frontal_label(cfg)[None])
        assert out["image"].shape == (1, 16, 16, 3)

    def test_gradients_flow_to_w_and_params(self, tiny):
        cfg, p = tiny
        c = _frontal_label(cfg)[None]
        w = jnp.zeros((1, cfg.num_ws, cfg.w_dim))

        def loss_w(w_):
            return jnp.mean(jnp.square(synthesis(p, cfg, w_, c)["image"]))

        g = jax.grad(loss_w)(w)
        assert float(jnp.abs(g).sum()) > 0

        def loss_p(dec_w):
            p2 = {**p, "decoder.net.0.weight": dec_w}
            return jnp.mean(jnp.square(synthesis(p2, cfg, w, c)["image"]))

        gp = jax.grad(loss_p)(p["decoder.net.0.weight"])
        assert float(jnp.abs(gp).sum()) > 0


class TestPTI:
    def test_w_stats(self, tiny):
        cfg, p = tiny
        w_avg, w_std = compute_w_stats(p, cfg, jax.random.PRNGKey(7),
                                       _frontal_label(cfg), n_samples=64)
        assert w_avg.shape == (cfg.w_dim,)
        assert float(w_std) > 0

    def test_projection_descends(self, tiny):
        cfg, p = tiny
        # w_norm off: from the w_avg pivot that term can only grow and at
        # tiny-config scale it swamps the (already small) image terms
        pti_cfg = PTIConfig(w_steps=12, pti_steps=8, w_avg_samples=32,
                            lambda_w_norm=0.0)
        key = jax.random.PRNGKey(8)
        # target: a render of the generator itself (recoverable)
        z = jax.random.normal(key, (1, cfg.z_dim))
        c = _frontal_label(cfg)[None]
        target = render_full(p, cfg, z, c)["image"]
        losses = []

        def log_fn(msg):
            losses.append(float(msg.split("mse ")[1].split(" ")[0]))

        ws = project_w(p, cfg, pti_cfg, target, c, key, log_fn=log_fn)
        assert ws.shape == (1, cfg.num_ws, cfg.w_dim)
        assert losses[-1] < losses[0]

        tuned = pti_finetune(p, cfg, pti_cfg, ws, target, c, log_fn=log_fn)
        # tuned params changed, frozen mapping untouched
        assert not np.allclose(
            np.asarray(tuned["decoder.net.0.weight"]),
            np.asarray(p["decoder.net.0.weight"]))
        np.testing.assert_array_equal(
            np.asarray(tuned["backbone.mapping.fc0.weight"]),
            np.asarray(p["backbone.mapping.fc0.weight"]))


class TestConverter:
    def test_npz_roundtrip(self, tiny, tmp_path):
        cfg, p = tiny
        path = str(tmp_path / "g_ema.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in p.items()})
        loaded, inferred = load_eg3d_from_torch(path)
        assert set(loaded) == set(p)
        assert inferred.backbone_resolution == cfg.backbone_resolution
        assert inferred.plane_channels == cfg.plane_channels
        assert inferred.triplane_depth == cfg.triplane_depth
        assert inferred.w_dim == cfg.w_dim
        assert inferred.num_mapping_layers == cfg.num_mapping_layers
        out_a = render_full(p, cfg, jnp.zeros((1, cfg.z_dim)),
                            _frontal_label(cfg)[None])["image"]
        out_b = render_full(loaded, cfg, jnp.zeros((1, cfg.z_dim)),
                            _frontal_label(cfg)[None])["image"]
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=1e-6)

    def test_torch_state_dict(self, tiny, tmp_path):
        torch = pytest.importorskip("torch")
        cfg, p = tiny
        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
        path = str(tmp_path / "g_ema.pth")
        torch.save(sd, path)
        loaded, inferred = load_eg3d_from_torch(path)
        assert set(loaded) == set(p)
        assert inferred.sr_resolution == cfg.sr_resolution


class TestProvider:
    def test_generate_protocol(self, tiny):
        cfg, p = tiny
        provider = EG3DPseudoProvider(
            p, cfg, PTIConfig(w_steps=4, pti_steps=3, w_avg_samples=16),
            EG3DProviderConfig(max_target_views=2))
        crops = np.random.RandomState(0).rand(6, 24, 24, 3).astype(np.float32)
        angles = np.linspace(0, 2 * np.pi, 6, endpoint=False)
        out = provider.generate(crops, angles)
        assert out.shape == (6, 24, 24, 3)
        assert np.isfinite(out).all()
        assert out.min() >= 0.0 and out.max() <= 1.0
