"""Baseline training-step tests: each model family trains end-to-end under
its fused jitted step; the registry constructs all five families by name."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train import baseline_steps as BS
from fateavatar_tpu.train.step import Frame
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

RES = 32
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=64, chunk=32)


def frame(seed=0):
    rng = np.random.default_rng(seed)
    return Frame(
        expression=jnp.asarray(rng.normal(size=4) * 0.2, jnp.float32),
        flame_pose=jnp.asarray(rng.normal(size=15) * 0.03, jnp.float32),
        camera=make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                           0.8, 0.8, RES, RES),
        rgb=jnp.asarray(rng.random((RES, RES, 3)), jnp.float32),
        bg_color=jnp.ones(3),
    )


@pytest.fixture(scope="module")
def flame():
    return synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)


def run_steps(step, ts, n=8):
    losses = []
    for i in range(n):
        ts, aux = step(ts, frame(i % 2))
        losses.append(float(aux["loss"]))
    return ts, losses


class TestGASteps:
    def test_trains(self, flame):
        from fateavatar_tpu.models.baselines import gaussianavatars as GA
        from fateavatar_tpu.train.losses import (
            GaussianAvatarsLoss, GaussianAvatarsLossConfig,
        )

        model, params, state = GA.init_gaussianavatars(
            flame, GA.GAConfig(sh_degree=0, capacity=256,
                               img_height=RES, img_width=RES)
        )
        opt = BS.gaussianavatars_optimizer({})
        step = BS.make_gaussianavatars_step(
            model, GaussianAvatarsLoss(GaussianAvatarsLossConfig()), opt,
            RENDER_CFG, densify_interval=10**9,
            opacity_reset_interval=10**9,
        )
        ts = BS._init_ts(params, state, opt)
        ts, losses = run_steps(step, ts, n=25)
        assert all(np.isfinite(losses))
        assert min(losses[-5:]) < losses[0]

    def test_densify_fires(self, flame):
        from fateavatar_tpu.models.baselines import gaussianavatars as GA
        from fateavatar_tpu.train.losses import (
            GaussianAvatarsLoss, GaussianAvatarsLossConfig,
        )

        model, params, state = GA.init_gaussianavatars(
            flame, GA.GAConfig(sh_degree=0, capacity=512,
                               img_height=RES, img_width=RES)
        )
        opt = BS.gaussianavatars_optimizer({})
        step = BS.make_gaussianavatars_step(
            model, GaussianAvatarsLoss(GaussianAvatarsLossConfig()), opt,
            RENDER_CFG, densify_interval=4, densify_from=0,
            densify_grad_threshold=0.0, opacity_reset_interval=10**9,
            densify_budget=64,
        )
        ts = BS._init_ts(params, state, opt)
        n0 = int(jnp.sum(ts.state.alive))
        ts, _ = run_steps(step, ts, n=4)
        assert int(jnp.sum(ts.state.alive)) != n0


class TestFlashSteps:
    def test_trains(self, flame):
        from fateavatar_tpu.models.baselines import flashavatar as FA
        from fateavatar_tpu.train.losses import FlashAvatarLoss

        model, params, net = FA.init_flashavatar(
            sphere_obj_mesh(96), flame,
            FA.FlashConfig(tex_size=8, img_height=RES, img_width=RES),
        )
        opt = BS.flashavatar_optimizer({})
        step = BS.make_flashavatar_step(model, net, FlashAvatarLoss(), opt,
                                        RENDER_CFG)
        ts = BS._init_ts(params, None, opt)
        ts, losses = run_steps(step, ts)
        assert losses[-1] < losses[0]


class TestSplattingSteps:
    def test_trains_with_walk(self, flame):
        from fateavatar_tpu.models.baselines import splattingavatar as SA
        from fateavatar_tpu.train.losses import SplattingAvatarLoss

        model, params, state = SA.init_splattingavatar(
            flame, SA.SplatConfig(num_samples=128, capacity=192,
                                  img_height=RES, img_width=RES)
        )
        opt = BS.splattingavatar_optimizer({})
        step = BS.make_splattingavatar_step(
            model, SplattingAvatarLoss(), opt, RENDER_CFG,
            triangle_walk_interval=4,
        )
        ts = BS._init_ts(params, state, opt)
        ts, losses = run_steps(step, ts, n=8)
        assert all(np.isfinite(losses))
        # after a walk event the uvd.xy has been zeroed at least once
        assert losses[-1] < losses[0]


class TestMonoSteps:
    def test_trains_and_epoch_maintenance(self, flame):
        from fateavatar_tpu.models.baselines import monogaussianavatar as MA
        from fateavatar_tpu.train.losses import (
            MonoGaussianAvatarLoss, MonoGaussianAvatarLossConfig,
        )

        model, params, state, nets = MA.init_monogaussianavatar(
            flame, MA.MonoConfig(n_init_points=64, max_points=512,
                                 img_height=RES, img_width=RES, cam_scale=1.0)
        )
        loss_fn = MonoGaussianAvatarLoss(
            MonoGaussianAvatarLossConfig(), model.flame
        )
        opt = BS.monogaussianavatar_optimizer({"lr": 1e-3})
        step = BS.make_monogaussianavatar_step(model, nets, loss_fn, opt,
                                               RENDER_CFG)
        ts = BS._init_ts(params, state, opt)
        ts, losses = run_steps(step, ts, n=6)
        assert all(np.isfinite(losses))

        # epoch maintenance grows the point count per the schedule
        # (monogaussianavatar.py:440-450: epoch < 5 -> 400, epoch 5 -> 800)
        ts = ts.replace(state=ts.state.replace(visible=ts.state.alive))
        ts2 = BS.mono_epoch_maintenance(ts, model, epoch=4, upsample_freq=4)
        assert int(jnp.sum(ts2.state.alive)) == 400
        ts2 = ts2.replace(state=ts2.state.replace(visible=ts2.state.alive))
        ts3 = BS.mono_epoch_maintenance(ts2, model, epoch=5, upsample_freq=5)
        assert int(jnp.sum(ts3.state.alive)) == 512  # 800 clamped to capacity
        assert float(ts3.state.radius) < float(ts.state.radius)


class TestRegistry:
    def test_all_models_constructible(self, flame):
        from fateavatar_tpu.train import registry

        template = sphere_obj_mesh(96)
        base_cfg = dict(img_height=RES, img_width=RES, tex_size=8,
                        capacity=256, num_samples=64, n_init_points=32,
                        max_points=128, sh_degree=0, cam_scale=1.0)
        for name in ("fateavatar", "gaussianavatars", "flashavatar",
                     "splattingavatar", "monogaussianavatar"):
            entry = registry.get(name)
            bundle = entry.build_model(template, flame, base_cfg)
            loss_fn = entry.build_loss({}, bundle)
            opt = entry.build_optimizer({})
            step = entry.build_step(bundle, loss_fn, opt, RENDER_CFG,
                                    dict(densify_interval=10**9,
                                         prune_interval=10**9,
                                         opacity_reset_interval=10**9))
            assert callable(step), name

    def test_unknown_model_raises(self):
        from fateavatar_tpu.train import registry

        import pytest

        with pytest.raises(KeyError):
            registry.get("nonexistent")


class TestAdapterTrainer:
    """Any registry family drives the rich Trainer via a FamilyAdapter
    (train/adapters.py — the reference's per-model trainer hooks,
    train/trainer.py:79-101)."""

    @pytest.mark.parametrize("name", ["gaussianavatars", "flashavatar"])
    def test_family_through_trainer(self, tmp_path, flame, name):
        from fateavatar_tpu.train import registry
        from fateavatar_tpu.train.adapters import make_family_adapter
        from fateavatar_tpu.train.datasets import SyntheticDataset
        from fateavatar_tpu.train.trainer import Trainer

        template = sphere_obj_mesh(96)
        entry = registry.get(name)
        model_cfg = dict(img_height=RES, img_width=RES, capacity=256,
                         tex_size=8, num_samples=128, n_init_points=32,
                         max_points=128, sh_degree=0,
                         dataset_type="synthetic")
        bundle = entry.build_model(template, flame, model_cfg)
        loss_fn = entry.build_loss({}, bundle)
        opt = entry.build_optimizer({})
        adapter = make_family_adapter(name, bundle, loss_fn, opt,
                                      RENDER_CFG, {"densify_interval": 10**9,
                                                   "densify_from_iter": 10**9,
                                                   "opacity_reset_interval":
                                                   10**9})
        state0 = (bundle[2]
                  if len(bundle) > 2 and not callable(bundle[2]) else None)
        ds = SyntheticDataset(num_frames=2, img_res=(RES, RES), n_exp=4)
        trainer = Trainer(
            name=name, model=bundle[0], params=bundle[1], state=state0,
            loss_fn=loss_fn, optimizer=opt, train_dataset=ds,
            test_dataset=SyntheticDataset(num_frames=2, img_res=(RES, RES),
                                          n_exp=4, seed=1),
            workspace=str(tmp_path / name), render_cfg=RENDER_CFG,
            snapshot_interval=10**9, adapter=adapter,
        )
        trainer.train(1)
        summary = trainer.evaluate("test")
        assert np.isfinite(summary["psnr"])
        # checkpoints round-trip through the adapter train state
        trainer.load_checkpoint()
        assert trainer.epoch == 1
