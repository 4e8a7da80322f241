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


class MockTracking:
    def __init__(self, T, n_exp=4, n_shape=6, seed=0):
        rng = np.random.default_rng(seed)
        self.shape = rng.normal(size=(1, n_shape)).astype(np.float32) * 0.1
        self.expression = rng.normal(size=(T, n_exp)).astype(np.float32) * 0.2
        self.rotation = rng.normal(size=(T, 3)).astype(np.float32) * 0.1
        self.rotation_matrices = np.tile(np.eye(3, dtype=np.float32), (T, 1, 1))
        self.translation = rng.normal(size=(T, 3)).astype(np.float32) * 0.01
        self.jaw = rng.normal(size=(T, 3)).astype(np.float32) * 0.05
        self.scale = np.asarray([[1.02]], np.float32)
        self.neck = rng.normal(size=(T, 3)).astype(np.float32) * 0.02
        self.eyes = rng.normal(size=(T, 6)).astype(np.float32) * 0.02
        self.frames = np.arange(T)


class MockManager:
    """Duck-typed stand-in for nersemble_benchmark's
    MonoFlameAvatarDataManager (benchmark/nersemble/dataset.py:30-47)."""

    def __init__(self, serials=("222200037", "222200040"), T=3):
        self.T = T
        rng = np.random.default_rng(1)
        K = np.array([[40.0, 0, RES / 2 + 1], [0, 40.0, RES / 2 - 2],
                      [0, 0, 1]], np.float32)

        class Calib:
            pass

        self.calib = Calib()
        self.calib.intrinsics = {s: K for s in serials}
        w2cs = {}
        for i, s in enumerate(serials):
            w2c = np.eye(4, dtype=np.float32)
            w2c[0, 3] = 0.02 * i
            w2c[2, 3] = 0.4
            w2cs[s] = w2c
        self.calib.world_2_cam = w2cs
        self._rng = rng

    def load_camera_calibration(self):
        return self.calib

    def load_flame_tracking(self, seq):
        return MockTracking(self.T, seed=hash(seq) % 2**31)

    def load_image(self, seq, serial, t):
        return self._rng.random((RES, RES, 3)).astype(np.float32)

    def load_alpha_map(self, seq, serial, t):
        return np.ones((RES, RES), np.float32)


def test_prepare_export_and_v2_dataset(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from prepare_nersemble import export_participant

    mgr = MockManager()
    pdir = export_participant(
        mgr, str(tmp_path), "393", ["SEQ-A", "SEQ-B"], "222200037",
        serials=["222200037", "222200040"], log_fn=lambda m: None)
    assert os.path.exists(os.path.join(pdir, "calibration.json"))
    assert os.path.exists(os.path.join(
        pdir, "sequences", "SEQ-A", "flame_params.json"))
    assert os.path.exists(os.path.join(
        pdir, "sequences", "SEQ-A", "images", "222200037", "00000.png"))
    assert os.path.exists(os.path.join(
        pdir, "sequences", "SEQ-A", "alpha", "222200037", "00000.png"))

    # the v2 dataset reads both sequences for the train serial
    ds = NersembleBenchmarkDataset(str(tmp_path), "393", "222200037",
                                   (RES, RES))
    assert len(ds) == 6            # 2 sequences x 3 frames
    assert ds.world_transforms is not None
    assert ds.world_transforms.shape == (6, 7)
    # scale lands in slot 6; global-rotation slot of pose15 is zero
    np.testing.assert_allclose(ds.world_transforms[:, 6], 1.02, atol=1e-6)
    np.testing.assert_allclose(ds.flame_pose[:, :3], 0.0)
    s = ds.sample(0)
    assert "world_transform" in s and s["world_transform"].shape == (7,)

    # single-sequence selection
    ds_b = NersembleBenchmarkDataset(str(tmp_path), "393", "222200040",
                                     (RES, RES), sequence_list=["SEQ-B"],
                                     mode="test")
    assert len(ds_b) == 3


def test_v2_train_and_submission_render(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from prepare_nersemble import export_participant
    from fateavatar_tpu.benchmark.nersemble import render_submission

    mgr = MockManager()
    export_participant(mgr, str(tmp_path), "393", ["SEQ-A"], "222200037",
                       serials=["222200037", "222200040"],
                       log_fn=lambda m: None)

    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(96), flame, cfg)

    ds = NersembleBenchmarkDataset(str(tmp_path), "393", "222200037",
                                   (RES, RES))
    trainer = Trainer(
        name="ners2", model=model, params=params, state=state,
        loss_fn=FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0)),
        optimizer=fateavatar_optimizers({}),
        train_dataset=ds, test_dataset=None, workspace=None,
        maint_cfg=MaintenanceConfig(densify_interval=10**9,
                                    prune_interval=10**9,
                                    opacity_reset_interval=10**9),
        render_cfg=RENDER_CFG, snapshot_interval=10**9,
    )
    trainer.epoch = 1
    trainer.train_epoch()   # world_transform flows through the train step
    assert trainer.global_step == 3

    vids = render_submission(
        model, trainer.ts.params, trainer.ts.state, str(tmp_path), "393",
        sequences=["SEQ-A"], serials=["222200037", "222200040"],
        img_res=(RES, RES), submit_dir=str(tmp_path / "submit"),
        render_cfg=RENDER_CFG, log_fn=lambda m: None,
    )
    assert len(vids) == 2
    for v in vids:
        assert v.endswith(".mp4")
        base = os.path.splitext(v)[0]
        assert os.path.exists(v) or os.path.exists(base + ".gif")
        assert "393/SEQ-A/cam_" in v.replace(os.sep, "/")


def test_world_transform_changes_render(tmp_path):
    """The model-to-world pose must actually move the avatar in frame."""
    import jax.numpy as jnp
    from fateavatar_tpu.models.fateavatar import fateavatar_forward

    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(96), flame, cfg)
    root = make_layout(str(tmp_path))
    ds = NersembleBenchmarkDataset(str(tmp_path), "393", "A", (RES, RES))
    cam = ds.camera(0, RES, RES)
    e = jnp.asarray(ds.expressions[0])
    p = jnp.asarray(ds.flame_pose[0])
    img0 = fateavatar_forward(model, params, state, e, p, cam,
                              render_cfg=RENDER_CFG)["rgb_image"]
    wt = jnp.asarray([0.0, 0.6, 0.0, 0.05, 0.0, 0.0, 1.0])
    img1 = fateavatar_forward(model, params, state, e, p, cam,
                              render_cfg=RENDER_CFG,
                              world_transform=wt)["rgb_image"]
    ident = jnp.asarray([0.0] * 6 + [1.0])
    img2 = fateavatar_forward(model, params, state, e, p, cam,
                              render_cfg=RENDER_CFG,
                              world_transform=ident)["rgb_image"]
    assert float(jnp.abs(img1 - img0).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img0), atol=1e-5)
