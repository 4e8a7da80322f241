"""Loader / Reenactor tests incl. tracking-enabled checkpoint restore."""

import numpy as np
import jax.numpy as jnp

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.datasets import SyntheticDataset
from fateavatar_tpu.train.loader import Loader, Reenactor
from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
from fateavatar_tpu.train.optim import fateavatar_optimizers
from fateavatar_tpu.train.step import MaintenanceConfig
from fateavatar_tpu.train.trainer import Trainer

RES = 32
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=64, chunk=32)


def build(tmp_path, tracking=False):
    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(96), flame, cfg)
    ds = SyntheticDataset(num_frames=2, img_res=(RES, RES), n_exp=4)
    if tracking:
        ds.optimize_tracking = True
    trainer = Trainer(
        name="ld", model=model, params=params, state=state,
        loss_fn=FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0)),
        optimizer=fateavatar_optimizers({}),
        train_dataset=ds,
        test_dataset=SyntheticDataset(num_frames=2, img_res=(RES, RES),
                                      n_exp=4, seed=1),
        workspace=str(tmp_path),
        maint_cfg=MaintenanceConfig(densify_interval=10**9,
                                    prune_interval=10**9,
                                    opacity_reset_interval=10**9),
        render_cfg=RENDER_CFG, snapshot_interval=10**9,
    )
    return model, params, state, trainer


def test_loader_plain_checkpoint(tmp_path):
    model, p0, s0, trainer = build(tmp_path, tracking=False)
    trainer.epoch = 1
    trainer.train_epoch()
    trainer.save_checkpoint()
    loader = Loader(model, p0, s0, str(tmp_path), render_cfg=RENDER_CFG)
    np.testing.assert_allclose(
        np.asarray(loader.params.offset), np.asarray(trainer.ts.params.offset)
    )


def test_loader_tracking_checkpoint(tmp_path):
    model, p0, s0, trainer = build(tmp_path, tracking=True)
    trainer.epoch = 1
    trainer.train_epoch()
    trainer.save_checkpoint()
    loader = Loader(model, p0, s0, str(tmp_path), render_cfg=RENDER_CFG)
    np.testing.assert_allclose(
        np.asarray(loader.params.offset), np.asarray(trainer.ts.params.offset)
    )


def test_reenactor_renders_sequence(tmp_path):
    model, p0, s0, trainer = build(tmp_path)
    trainer.epoch = 1
    trainer.train_epoch()
    trainer.save_checkpoint()
    re = Reenactor(model, p0, s0, str(tmp_path), render_cfg=RENDER_CFG)
    cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]), 0.8, 0.8,
                      RES, RES)
    rng = np.random.default_rng(0)
    frames = re.reenact(
        rng.normal(size=(3, 4)).astype(np.float32) * 0.2,
        rng.normal(size=(3, 15)).astype(np.float32) * 0.02,
        delta_exp=np.zeros(4, np.float32),
        camera=cam,
        out_path=str(tmp_path / "re.mp4"),
    )
    assert len(frames) == 3
    assert all(np.isfinite(f).all() for f in frames)
