"""Train any registered baseline avatar family by name
(the reference reuses train_mono_avatar.py with --model_name via
train/callbacks.py; here: a dedicated CLI over train/registry.py).

Usage:
  python -m fateavatar_tpu.cli.train_baseline --model gaussianavatars \
      --config configs/fateavatar.yaml dataset.root_path=/data/insta/obama
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True,
                        choices=["gaussianavatars", "flashavatar",
                                 "splattingavatar", "monogaussianavatar"])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from fateavatar_tpu.cli import common
    from fateavatar_tpu.train import baseline_steps as BS
    from fateavatar_tpu.train import registry
    from fateavatar_tpu.train.datasets import Prefetcher
    from fateavatar_tpu.train.step import Frame
    from fateavatar_tpu.utils.config import config_to_dict, load_config
    from fateavatar_tpu.utils.logging import Logger
    from fateavatar_tpu.utils.obj_io import load_obj

    if args.config is None:
        import os

        default = os.path.join("configs", f"{args.model}.yaml")
        if os.path.exists(default):
            args.config = default
    cfg = load_config(args.config, args.overrides)
    train_ds, test_ds = common.construct_datasets(cfg)
    flame = common.construct_flame(cfg, train_ds)
    template = load_obj(cfg.assets.template_mesh_path)

    entry = registry.get(args.model)
    model_cfg = dict(config_to_dict(cfg.model))
    model_cfg.update(
        img_height=cfg.dataset.img_res[0], img_width=cfg.dataset.img_res[1],
        capacity=cfg.training.max_points_num,
        dataset_type=train_ds.type_name,
    )
    bundle = entry.build_model(template, flame, model_cfg)
    loss_fn = entry.build_loss(config_to_dict(cfg.loss), bundle)
    opt = entry.build_optimizer(config_to_dict(cfg.training))
    step = entry.build_step(
        bundle, loss_fn, opt, common.render_config(cfg),
        config_to_dict(cfg.training),
    )

    params = bundle[1]
    state = bundle[2] if len(bundle) > 2 and not callable(bundle[2]) else None
    ts = BS._init_ts(params, state, opt, seed=cfg.seed)
    logger = Logger(f"{args.model}", cfg.workspace)

    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        total, count = 0.0, 0
        for sample in Prefetcher(train_ds, np.arange(len(train_ds))):
            cam_pose = np.asarray(sample["cam_pose"], np.float32)
            from fateavatar_tpu.ops.camera import make_camera

            frame = Frame(
                expression=jnp.asarray(sample["expression"], jnp.float32),
                flame_pose=jnp.asarray(sample["flame_pose"], jnp.float32),
                camera=make_camera(
                    cam_pose[:3, :3].T, cam_pose[:3, 3],
                    sample["fovx"], sample["fovy"],
                    cfg.dataset.img_res[1], cfg.dataset.img_res[0],
                ),
                rgb=jnp.asarray(sample["ground_truth"]["rgb"], jnp.float32),
                bg_color=jnp.ones(3),
            )
            ts, aux = step(ts, frame)
            total += float(aux["loss"])
            count += 1
        if args.model == "monogaussianavatar":
            ts = BS.mono_epoch_maintenance(ts, bundle[0], epoch)
        dt = time.time() - t0
        logger.log(
            f"[{args.model} epoch {epoch}] loss={total / max(count, 1):.5f} "
            f"({count / max(dt, 1e-9):.2f} it/s)"
        )

        # checkpoint + eval frame per epoch
        import os

        from fateavatar_tpu.train.checkpoints import save_pytree
        from fateavatar_tpu.train.metrics import PSNRMeter
        from fateavatar_tpu.utils.logging import save_image

        ws = os.path.join(cfg.workspace, f"baseline_{args.model}")
        os.makedirs(os.path.join(ws, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(ws, "media"), exist_ok=True)
        save_pytree(
            os.path.join(ws, "checkpoints", f"epoch{epoch}.npz"),
            {"params": ts.params, "state": ts.state},
        )
        if len(test_ds):
            s = test_ds.sample(0)
            cam_pose = np.asarray(s["cam_pose"], np.float32)
            from fateavatar_tpu.ops.camera import make_camera

            camera = make_camera(
                cam_pose[:3, :3].T, cam_pose[:3, 3], s["fovx"], s["fovy"],
                cfg.dataset.img_res[1], cfg.dataset.img_res[0],
            )
            img = _eval_render(args.model, bundle, ts, camera,
                               jnp.asarray(s["expression"], jnp.float32),
                               jnp.asarray(s["flame_pose"], jnp.float32),
                               common.render_config(cfg))
            if img is not None:
                m = PSNRMeter()
                m.update(img, jnp.asarray(s["ground_truth"]["rgb"]))
                logger.log(f"[{args.model} epoch {epoch}] eval PSNR "
                           f"{m.measure():.2f}")
                save_image(
                    os.path.join(ws, "media", f"eval_epoch{epoch}.png"),
                    np.asarray(img),
                )


def _eval_render(name, bundle, ts, camera, expr, pose, render_cfg):
    from fateavatar_tpu.models.baselines import (
        flashavatar as FA,
        gaussianavatars as GA,
        monogaussianavatar as MA,
        splattingavatar as SA,
    )

    if name == "gaussianavatars":
        return GA.ga_forward(bundle[0], ts.params, ts.state, expr, pose,
                             camera, render_cfg=render_cfg)["rgb_image"]
    if name == "flashavatar":
        return FA.flash_forward(bundle[0], ts.params, bundle[2], expr, pose,
                                camera, render_cfg=render_cfg)["rgb_image"]
    if name == "splattingavatar":
        return SA.splat_forward(bundle[0], ts.params, ts.state, expr, pose,
                                camera, render_cfg=render_cfg)["rgb_image"]
    if name == "monogaussianavatar":
        return MA.mono_forward(bundle[0], ts.params, ts.state, bundle[3],
                               expr, pose, camera,
                               render_cfg=render_cfg)["rgb_image"]
    return None


if __name__ == "__main__":
    main()
