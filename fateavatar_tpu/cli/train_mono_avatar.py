"""Stage-1 monocular avatar training CLI (train_mono_avatar.py:18-97).

Usage:
  python -m fateavatar_tpu.cli.train_mono_avatar --config configs/fateavatar.yaml \
      dataset.root_path=/data/insta/obama workspace=./ws/obama
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--dp", type=int, default=0,
                        help="data-parallel over N devices (frames batch "
                             "over a jax Mesh; gradients psum over ICI)")
    parser.add_argument("overrides", nargs="*", help="key.path=value")
    args = parser.parse_args(argv)

    from fateavatar_tpu.cli import common
    from fateavatar_tpu.train.trainer import Trainer
    from fateavatar_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)

    from fateavatar_tpu.utils.misc import file_backup, seed_everything

    seed_everything(cfg.seed)
    file_backup(cfg.workspace)  # reproducibility source snapshot

    train_ds, test_ds = common.construct_datasets(cfg)
    flame = common.construct_flame(cfg, train_ds)
    model, params, state = common.construct_model(cfg, flame)
    loss_fn = common.construct_loss(cfg, faces=model.faces)
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.utils.config import config_to_dict

    optimizer = fateavatar_optimizers(config_to_dict(cfg.training))

    common.save_identity_info(cfg.workspace, train_ds, cfg)

    trainer = Trainer(
        name=cfg.name,
        model=model, params=params, state=state,
        loss_fn=loss_fn, optimizer=optimizer,
        train_dataset=train_ds, test_dataset=test_ds,
        workspace=cfg.workspace,
        maint_cfg=common.maintenance_config(cfg),
        render_cfg=common.render_config(cfg),
        tracking_lr=cfg.training.tracking_lr,
        seed=cfg.seed,
        data_parallel=args.dp,
        snapshot_interval=cfg.training.snapshot_interval,
        device_frame_cache=cfg.training.device_frame_cache,
        lpips_weights_path=cfg.assets.lpips_weights_path,
        scan_unroll=cfg.training.scan_unroll,
    )
    if args.resume:
        trainer.load_checkpoint()

    epochs = args.epochs or cfg.training.epochs.get(train_ds.type_name, 10)
    trainer.train(epochs)
    if train_ds.optimize_tracking:
        trainer.evaluate("test", optim_epoch=cfg.training.epochs.get("finetune", 50))
    else:
        trainer.evaluate("test")


if __name__ == "__main__":
    main()
