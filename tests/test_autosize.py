"""Workload-driven binning-cap sizing (render/autosize.py).

The CUDA reference sizes its instance list exactly per frame
(rasterizer_impl.cu:277-285); under static XLA shapes the caps must be
measured up front. These tests pin that the probe measures TRUE occupancy
(cross-checked against the renderer's own overflow counter) and that
caps sized from the measurement never overflow on the probed workload.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
from fateavatar_tpu.models.fateavatar import build_gaussians
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render import binning
from fateavatar_tpu.render.autosize import (
    autosize_render_config, make_occupancy_probe, occupancy_stats, size_caps,
)
from fateavatar_tpu.render.preprocess import preprocess
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.train.step import Frame

RES = 64


@pytest.fixture(scope="module")
def avatar():
    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    mesh = sphere_obj_mesh = __import__(
        "fateavatar_tpu.utils.obj_io", fromlist=["sphere_obj_mesh"]
    ).sphere_obj_mesh(96)
    cfg = FateAvatarConfig(
        tex_size=16, capacity=400, img_height=RES, img_width=RES,
        normal_offset=0.02,
    )
    return init_fateavatar(mesh, flame, cfg)


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    return Frame(
        expression=jnp.asarray(rng.normal(size=4) * 0.3, jnp.float32),
        flame_pose=jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32),
        camera=make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                           0.8, 0.8, RES, RES),
        rgb=jnp.asarray(rng.random((RES, RES, 3)), jnp.float32),
        bg_color=jnp.ones(3),
    )


def _occupancy_brute(model, params, state, frame):
    """Brute-force per-gaussian rect areas via the same preprocess."""
    g, _, _ = build_gaussians(model, params, state, frame.expression,
                              frame.flame_pose)
    prep = preprocess(
        frame.camera, g.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_features, g.sh_degree, alive=g.alive, stacked=False,
    )
    grid = binning.tile_grid(frame.camera.width, frame.camera.height)
    rx0, ry0, rx1, ry1 = jax.device_get(
        binning.gaussian_rect((prep.soa[0], prep.soa[1]), prep.radius, grid))
    radius = np.asarray(jax.device_get(prep.radius))
    areas = np.where(radius > 0, (rx1 - rx0) * (ry1 - ry0), 0)
    return int(areas.sum()), int(areas.max())


class TestOccupancy:
    def test_probe_matches_brute_force(self, avatar):
        model, params, state = avatar
        frame = _frame()
        probe = make_occupancy_probe(model, frame.camera)
        t, m, nb = probe(params, state, frame.expression, frame.flame_pose)
        bt, bm = _occupancy_brute(model, params, state, frame)
        assert int(t) == bt and int(m) == bm
        assert int(nb) >= 0

    def test_renderer_overflow_consistent_with_probe(self, avatar):
        """Caps strictly below the measured occupancy MUST overflow by
        exactly the excess; caps at/above it must not."""
        model, params, state = avatar
        frame = _frame()
        probe = make_occupancy_probe(model, frame.camera)
        t, m, _ = probe(params, state, frame.expression, frame.flame_pose)
        total, max_t = int(t), int(m)
        assert total > 0 and max_t >= 1

        g, _, _ = build_gaussians(model, params, state, frame.expression,
                                  frame.flame_pose)
        R = 1 << int(np.ceil(np.log2(max_t)))

        # generous caps: no overflow
        cfg = RenderConfig(impl="xla", instance_budget=total + 64,
                           max_tiles_per_gaussian=R)
        out = render(frame.camera, g, frame.bg_color, config=cfg)
        assert int(out["overflow"]) == 0

        # budget short by k: exactly k instances dropped (R generous)
        short = 37
        cfg = RenderConfig(impl="xla", instance_budget=total - short,
                           max_tiles_per_gaussian=R)
        out = render(frame.camera, g, frame.bg_color, config=cfg)
        assert int(out["overflow"]) == short

    def test_sized_caps_render_clean(self, avatar):
        model, params, state = avatar
        frame = _frame()
        cfg = autosize_render_config(
            model, params, state, frame, RenderConfig(impl="xla"),
        )
        g, _, _ = build_gaussians(model, params, state, frame.expression,
                                  frame.flame_pose)
        out = render(frame.camera, g, frame.bg_color, config=cfg)
        assert int(out["overflow"]) == 0

    def test_size_caps_bounds(self):
        base = RenderConfig(impl="xla")
        cfg = size_caps(total=10_000, max_t=5, n=4096, num_tiles=1024, base_cfg=base)
        # R: ceil(5 * 1.25 / 4) * 4 = 8; M: chunk-aligned >= 1.08 * 10000
        assert cfg.max_tiles_per_gaussian == 8
        assert cfg.instance_budget >= int(10_000 * 1.08)
        assert cfg.instance_budget % 4096 == 0
        assert cfg.instance_budget <= 4096 * 16
        # R never exceeds the tile count's pow2
        cfg = size_caps(total=100, max_t=5000, n=64, num_tiles=1024,
                        base_cfg=base)
        assert cfg.max_tiles_per_gaussian == 1024

    def test_occupancy_stats_dead_gaussians_count_zero(self):
        grid = (4, 4)
        mean2d = jnp.asarray([[8.0, 8.0], [40.0, 40.0]])
        radius = jnp.asarray([10, 0], jnp.int32)
        total, max_t, n_big = occupancy_stats(mean2d, None, radius, grid)
        rx0, ry0, rx1, ry1 = jax.device_get(
            binning.gaussian_rect(mean2d, radius, grid))
        want = int((rx1[0] - rx0[0]) * (ry1[0] - ry0[0]))
        assert int(total) == want and int(max_t) == want


def test_trainer_autosize_startup(avatar=None):
    """render.autosize=True sizes the Trainer's caps from the dataset at
    startup; training runs clean (no overflow warnings)."""
    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.train.datasets import SyntheticDataset
    from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import MaintenanceConfig
    from fateavatar_tpu.train.trainer import Trainer
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(96), flame, cfg)
    ds = SyntheticDataset(num_frames=3, img_res=(RES, RES), n_exp=4)
    tr = Trainer(
        name="asz", model=model, params=params, state=state,
        loss_fn=FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0)),
        optimizer=fateavatar_optimizers({}),
        train_dataset=ds, test_dataset=None, workspace=None,
        maint_cfg=MaintenanceConfig(densify_interval=10**9,
                                    prune_interval=10**9,
                                    opacity_reset_interval=10**9),
        render_cfg=RenderConfig(impl="xla", max_per_tile=64, chunk=32,
                                binning="twotier", autosize=True),
        snapshot_interval=10**9,
    )
    assert tr.render_cfg.autosize is False          # consumed at startup
    assert tr.render_cfg.instance_budget > 0
    assert tr.render_cfg.tail_k >= 128
    tr.epoch = 1
    tr.train_epoch()
    assert tr.global_step == 3
