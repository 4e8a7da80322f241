"""Completion framework tests: orbit camera sampler, pseudo-view pipeline
stages, pseudo dataset, completion trainer (re-seed + augmentation)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.completion.camera_sampler import (
    orbit_cameras, sample_orbit_pose,
)
from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
from fateavatar_tpu.train.optim import fateavatar_optimizers
from fateavatar_tpu.train.step import MaintenanceConfig
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

RES = 32
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=64, chunk=32)


@pytest.fixture(scope="module")
def avatar():
    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    mesh = sphere_obj_mesh(96)
    cfg = FateAvatarConfig(tex_size=8, capacity=192, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    return init_fateavatar(mesh, flame, cfg)


class TestOrbitSampler:
    def test_camera_looks_at_target(self):
        lookat = np.array([0.1, 0.0, -0.2])
        c2w = sample_orbit_pose(1.3, np.pi / 2, lookat, radius=2.0)
        # camera-to-target direction == forward axis
        fwd = c2w[:3, 2]
        to_target = lookat - c2w[:3, 3]
        to_target /= np.linalg.norm(to_target)
        np.testing.assert_allclose(fwd, to_target, atol=1e-5)
        # on the sphere CENTERED AT THE WORLD ORIGIN (EG3D convention,
        # camera_eg3d.py:36-50 — origins are not offset by lookat)
        np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 2.0, atol=1e-5)

    def test_orbit_cameras_project_center(self):
        cams, c2ws = orbit_cameras(8, np.zeros(3), 0.5, 0.8, 0.8, RES, RES)
        for cam in cams:
            clip = cam.full_proj @ jnp.array([0.0, 0, 0, 1.0])
            ndc = clip[:3] / clip[3]
            np.testing.assert_allclose(np.asarray(ndc[:2]), 0.0, atol=1e-4)


class TestPseudoPipeline:
    def test_full_pipeline_runs(self, avatar, tmp_path):
        from fateavatar_tpu.completion.pseudo import (
            PseudoGenerator, PseudoGeneratorConfig,
        )

        model, params, state = avatar
        gen = PseudoGenerator(
            model, params, state,
            PseudoGeneratorConfig(num_views=6, orbit_radius=0.5,
                                  crop_size=RES,
                                  out_dir=str(tmp_path / "pseudo")),
            render_cfg=RENDER_CFG,
        )
        out = gen.run(0.8, 0.8)
        assert out["renders"].shape == (6, RES, RES, 3)
        # pseudo views live in the aligned GAN frame (crop_size + FFHQ
        # expand borders); pasted frames are back in the render framing
        assert out["pseudo"].shape[0] == 6
        assert out["pasted"].shape == (6, RES, RES, 3)
        assert out["masks"].shape == (6, RES, RES)
        assert os.path.exists(tmp_path / "pseudo" / "trajectory.json")
        assert len(os.listdir(tmp_path / "pseudo" / "image")) == 6
        # back half of the orbit is pose-rejected (completion.py:419)
        if out["aligned"] is not None:
            assert 0 < len(out["aligned"]["index"]) < 6

    def test_crop_paste_roundtrip(self, avatar):
        from fateavatar_tpu.completion.pseudo import PseudoGenerator

        # smooth gradient image: the roundtrip involves down/up resampling,
        # which would not reproduce white noise
        y, x = np.mgrid[0:64, 0:64] / 64.0
        img = np.stack([x, y, 0.5 * (x + y)], -1).astype(np.float32)
        quad = np.array([[10, 10], [10, 50], [50, 50], [50, 10]], np.float32)
        crop, M = PseudoGenerator.crop_with_quad(img, quad, 32)
        assert crop.shape == (32, 32, 3)
        pasted = PseudoGenerator.paste_back(img, crop, M)
        # inside the quad the paste reproduces the original (up to resample)
        inner = np.abs(pasted[20:40, 20:40] - img[20:40, 20:40]).mean()
        assert inner < 0.1
        # outside untouched
        np.testing.assert_allclose(pasted[:5, :5], img[:5, :5], atol=1e-5)


class TestCompletionTrainer:
    def _build(self, tmp_path, avatar):
        from fateavatar_tpu.completion.pseudo import (
            PseudoGenerator, PseudoGeneratorConfig,
        )
        from fateavatar_tpu.completion.trainer import (
            CompletionTrainer, PseudoDataset,
        )
        from fateavatar_tpu.train.datasets import SyntheticDataset

        model, params, state = avatar
        pseudo_dir = str(tmp_path / "pseudo")
        gen = PseudoGenerator(
            model, params, state,
            PseudoGeneratorConfig(num_views=8, orbit_radius=0.5,
                                  out_dir=pseudo_dir),
            render_cfg=RENDER_CFG,
        )
        gen.run(0.8, 0.8)

        pd = PseudoDataset(
            pseudo_dir, img_res=(RES, RES), n_exp=4,
            orbit_radius=0.5,
        )
        assert len(pd) == 4  # middle half of 8

        trainer = CompletionTrainer(
            name="comp",
            model=model, params=params, state=state,
            loss_fn=FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0)),
            optimizer=fateavatar_optimizers({}),
            train_dataset=SyntheticDataset(num_frames=2, img_res=(RES, RES), n_exp=4),
            test_dataset=SyntheticDataset(num_frames=2, img_res=(RES, RES),
                                          n_exp=4, seed=1),
            workspace=str(tmp_path / "ws"),
            maint_cfg=MaintenanceConfig(densify_interval=10**9,
                                        prune_interval=10**9,
                                        opacity_reset_interval=10**9),
            render_cfg=RENDER_CFG,
            snapshot_interval=10**9,
            pseudo_dataset=pd,
        )
        return trainer

    def test_add_default_points_and_augmentation(self, tmp_path, avatar):
        trainer = self._build(tmp_path, avatar)
        # kill most splats to simulate monocular pruning
        trainer.ts = trainer.ts.replace(
            state=trainer.ts.state.replace(
                alive=trainer.ts.state.alive.at[32:].set(False)
            )
        )
        n_before = int(jnp.sum(trainer.ts.state.alive))
        trainer.add_default_points()
        n_after = int(jnp.sum(trainer.ts.state.alive))
        assert n_after > n_before

        trainer.augmentation(finetune_epochs=1)
        # one real + one pseudo step per real frame
        assert trainer.global_step == 4

    def test_orbit_videos(self, tmp_path, avatar):
        trainer = self._build(tmp_path, avatar)
        frames = trainer.render_dynamic_novel_view(
            str(tmp_path / "orbit.mp4"), num_frames=4, radius=0.5
        )
        assert len(frames) == 4
        assert all(np.isfinite(f).all() for f in frames)


class TestSegmentation:
    """Native BiSeNet face parsing (completion/segmentation.py), the stage-8
    mask network (reference train/completion.py:818-886)."""

    def test_forward_shape_and_finiteness(self):
        from fateavatar_tpu.completion import segmentation as seg

        params = seg.init_bisenet(0)
        x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)),
                        jnp.float32)
        logits = seg.bisenet_forward(params, x)
        assert logits.shape == (1, 64, 64, seg.N_CLASSES)
        assert bool(jnp.all(jnp.isfinite(logits)))
        cls = seg.parse_faces(params, x)
        assert cls.shape == (1, 64, 64)
        assert int(cls.min()) >= 0 and int(cls.max()) < seg.N_CLASSES

    def test_torch_converter_roundtrip(self, tmp_path):
        import torch

        from fateavatar_tpu.completion import segmentation as seg

        rng = np.random.default_rng(2)
        sd = {}
        for name, shape in seg._shape_table().items():
            arr = rng.normal(0, 0.05, shape).astype(np.float32)
            if name.endswith("running_var"):
                arr = np.abs(arr) + 0.5
            if arr.ndim == 4:  # store as torch OIHW
                arr = arr.transpose(3, 2, 0, 1)
            sd[name] = torch.from_numpy(arr.copy())
        # extra keys a real checkpoint carries must be ignored
        sd["conv_out16.conv_out.weight"] = torch.zeros(19, 64, 1, 1)
        sd["cp.resnet.bn1.num_batches_tracked"] = torch.tensor(7)
        path = str(tmp_path / "bisenet.pth")
        torch.save(sd, path)

        params = seg.load_bisenet_from_torch(path)
        assert params["cp.resnet.conv1.weight"].shape == (7, 7, 3, 64)
        x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        logits = seg.bisenet_forward(params, x)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_matting_fn_contract(self):
        from fateavatar_tpu.completion import segmentation as seg

        fn = seg.make_bisenet_matting_fn(seg.init_bisenet(3), infer_size=32)
        img = np.random.default_rng(4).random((48, 48, 3)).astype(np.float32)
        mask = fn(img)
        assert mask.shape == (48, 48)
        assert set(np.unique(mask)).issubset({0.0, 1.0})
