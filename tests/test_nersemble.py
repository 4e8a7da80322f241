"""NeRSemble benchmark harness test: generate the exported layout, train a
couple of steps via the normal Trainer path (intrinsics-shift camera), and
render a hold-out serial."""

import json
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from fateavatar_tpu.benchmark.nersemble import (
    NersembleBenchmarkDataset, render_hold_out_serials,
)
from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
from fateavatar_tpu.train.optim import fateavatar_optimizers
from fateavatar_tpu.train.step import MaintenanceConfig
from fateavatar_tpu.train.trainer import Trainer
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

RES = 32
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=64, chunk=32)


def make_layout(root, participant="393", serials=("A", "B"), n_frames=3,
                n_exp=4):
    rng = np.random.default_rng(0)
    pdir = os.path.join(root, participant)
    os.makedirs(pdir, exist_ok=True)
    K = np.array([[40.0, 0, RES / 2 + 2], [0, 40.0, RES / 2 - 1], [0, 0, 1]])
    calib = {}
    for i, s in enumerate(serials):
        w2c = np.eye(4)
        w2c[0, 3] = 0.02 * i
        w2c[2, 3] = 0.4
        calib[s] = {"K": K.tolist(), "world2cam": w2c.tolist()}
    with open(os.path.join(pdir, "calibration.json"), "w") as f:
        json.dump(calib, f)
    frames = [
        {"name": f"{i:05d}",
         "expression": (rng.normal(size=n_exp) * 0.2).tolist(),
         "pose": (rng.normal(size=15) * 0.02).tolist()}
        for i in range(n_frames)
    ]
    with open(os.path.join(pdir, "flame_params.json"), "w") as f:
        json.dump({
            "frames": frames, "shape_params": [0.0] * 6,
            "n_shape": 6, "n_exp": n_exp,
            "native_width": RES, "native_height": RES,
        }, f)
    img_dir = os.path.join(pdir, "images", serials[0])
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_frames):
        Image.fromarray(
            (rng.random((RES, RES, 3)) * 255).astype("uint8")
        ).save(os.path.join(img_dir, f"{i:05d}.png"))
    return root


def test_nersemble_train_and_render(tmp_path):
    root = make_layout(str(tmp_path))
    ds = NersembleBenchmarkDataset(str(tmp_path), "393", "A", (RES, RES))
    assert len(ds) == 3
    assert ds.n_exp == 4
    s = ds.sample(0)
    assert "intrinsics_K" in s

    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(96), flame, cfg)

    trainer = Trainer(
        name="ners", model=model, params=params, state=state,
        loss_fn=FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0)),
        optimizer=fateavatar_optimizers({}),
        train_dataset=ds, test_dataset=None, workspace=None,
        maint_cfg=MaintenanceConfig(densify_interval=10**9,
                                    prune_interval=10**9,
                                    opacity_reset_interval=10**9),
        render_cfg=RENDER_CFG, snapshot_interval=10**9,
    )
    trainer.epoch = 1
    trainer.train_epoch()
    assert trainer.global_step == 3

    out = render_hold_out_serials(
        model, trainer.ts.params, trainer.ts.state,
        str(tmp_path), "393", ("B",), (RES, RES),
        str(tmp_path / "sub"), RENDER_CFG,
    )
    assert len(out) == 1
    # a video (mp4 or gif fallback) exists
    base = os.path.splitext(out[0])[0]
    assert os.path.exists(out[0]) or os.path.exists(base + ".gif")
