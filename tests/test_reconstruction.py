"""End-to-end reconstruction quality test: optimize a fresh avatar to match
multi-view renders of a GROUND-TRUTH avatar with randomized appearance —
the strongest automated check that forward + gradients + optimizer actually
reconstruct (the reference relies on human inspection of metrics/snapshots;
SURVEY.md §4 calls for doing better)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
from fateavatar_tpu.ops.camera import look_at_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
from fateavatar_tpu.train.optim import fateavatar_optimizers
from fateavatar_tpu.train.step import (
    Frame, MaintenanceConfig, init_train_state, make_train_step,
)
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

RES = 48
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=128, chunk=32)


def test_self_reconstruction_psnr():
    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    mesh = sphere_obj_mesh(96)
    cfg = FateAvatarConfig(tex_size=16, capacity=256, img_height=RES,
                           img_width=RES, normal_offset=0.02)

    # ground-truth avatar: random colours + opacities
    model, gt_params, state = init_fateavatar(mesh, flame, cfg,
                                              bg_color=(0, 0, 0))
    rng = np.random.default_rng(7)
    gt_params = gt_params.replace(
        features_dc=jnp.asarray(
            rng.uniform(-1.2, 1.2, gt_params.features_dc.shape), jnp.float32
        ),
        opacity=jnp.full_like(gt_params.opacity, 3.0),  # mostly opaque
    )

    cams = [
        look_at_camera(
            [0.35 * np.sin(a), 0.05, 0.35 * np.cos(a)], [0, 0, 0], [0, 1, 0],
            0.8, 0.8, RES, RES,
        )
        for a in np.linspace(-0.5, 0.5, 4)
    ]
    expr = jnp.zeros(4)
    pose = jnp.zeros(15)

    from fateavatar_tpu.models import fateavatar_forward

    gt_images = [
        fateavatar_forward(model, gt_params, state, expr, pose, cam,
                           render_cfg=RENDER_CFG)["rgb_image"]
        for cam in cams
    ]

    # fresh avatar trains against those renders
    _, params, _ = init_fateavatar(mesh, flame, cfg, bg_color=(0, 0, 0))
    loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0))
    opt = fateavatar_optimizers({"feature_dc_lr": 0.05, "opacity_lr": 0.08})
    step = make_train_step(
        model, loss_fn, opt,
        MaintenanceConfig(densify_interval=10**9, prune_interval=10**9,
                          opacity_reset_interval=10**9),
        render_cfg=RENDER_CFG,
    )
    ts = init_train_state(params, state, opt)

    frames = [
        Frame(expression=expr, flame_pose=pose, camera=cam,
              rgb=gt, bg_color=jnp.zeros(3))
        for cam, gt in zip(cams, gt_images)
    ]
    for i in range(300):
        ts, aux = step(ts, frames[i % len(frames)])

    psnrs = []
    for cam, gt in zip(cams, gt_images):
        img = fateavatar_forward(model, ts.params, ts.state, expr, pose, cam,
                                 render_cfg=RENDER_CFG)["rgb_image"]
        psnrs.append(float(-10 * jnp.log10(jnp.mean((img - gt) ** 2))))

    assert min(psnrs) > 25.0, f"reconstruction too weak: PSNR={psnrs}"
