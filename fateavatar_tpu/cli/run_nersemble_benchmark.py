"""NeRSemble mono-FLAME-avatar benchmark CLI.

Equivalent of train_nersemble_benchmark_mono.py + run_nersemble_benchmark.py
(+ the looping .sh): per participant, train FateAvatar on the train serial
(n_shape=100 / n_exp=300, intrinsics-shift cameras), then render every
hold-out serial's test sequence to submission videos.

Usage:
  python -m fateavatar_tpu.cli.run_nersemble_benchmark \
      --config configs/fateavatar.yaml --root /data/nersemble_export \
      --participants 393 404 461 477 486 --epochs 10
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--root", type=str, required=True,
                        help="exported benchmark layout (see benchmark/nersemble.py)")
    parser.add_argument("--participants", nargs="+", required=True)
    parser.add_argument("--train_serial", type=str, default=None)
    parser.add_argument("--train_sequences", nargs="*", default=None,
                        help="default: every sequence that has images")
    parser.add_argument("--test_sequences", nargs="*", default=None,
                        help="default: every sequence (the reference packs "
                        "SEQUENCES_TEST x hold-out+train serials)")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--crf", type=int, default=14)
    parser.add_argument("--out", type=str, default="./nersemble_submission")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from fateavatar_tpu.benchmark.nersemble import (
        DEFAULT_HOLD_OUT_SERIALS, DEFAULT_TRAIN_SERIAL,
        NersembleBenchmarkDataset, render_submission,
    )
    from fateavatar_tpu.cli import common
    from fateavatar_tpu.flame import load_flame_pickle, make_flame
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.trainer import Trainer
    from fateavatar_tpu.utils.config import config_to_dict, load_config
    from fateavatar_tpu.utils.obj_io import load_obj

    cfg = load_config(args.config, args.overrides)
    train_serial = args.train_serial or DEFAULT_TRAIN_SERIAL

    for participant in args.participants:
        seq_root = os.path.join(args.root, participant, "sequences")
        if args.train_sequences is not None:
            train_seqs = args.train_sequences
        elif os.path.isdir(seq_root):
            # train on every sequence that carries exported images
            train_seqs = sorted(
                s for s in os.listdir(seq_root)
                if os.path.isdir(os.path.join(seq_root, s, "images")))
        else:
            train_seqs = None   # legacy single-sequence layout
        ds = NersembleBenchmarkDataset(
            args.root, participant, train_serial, cfg.dataset.img_res,
            sequence_list=train_seqs, mode="train",
        )
        flame_data = load_flame_pickle(cfg.assets.flame_model_path)
        flame = make_flame(
            flame_data, n_shape=ds.n_shape, n_exp=ds.n_exp,
            shape_params=ds.shape_params,
            canonical_expression=ds.mean_expression,
            canonical_pose=cfg.dataset.canonical_pose,
        )
        model, params, state = common.construct_model(
            cfg, flame, template=load_obj(cfg.assets.template_mesh_path)
        )
        loss_fn = common.construct_loss(cfg, faces=model.faces)
        optimizer = fateavatar_optimizers(config_to_dict(cfg.training))

        workspace = os.path.join(cfg.workspace, f"nersemble_{participant}")
        trainer = Trainer(
            name=f"nersemble_{participant}",
            model=model, params=params, state=state,
            loss_fn=loss_fn, optimizer=optimizer,
            train_dataset=ds, test_dataset=None,
            workspace=workspace,
            maint_cfg=common.maintenance_config(cfg),
            render_cfg=common.render_config(cfg),
            seed=cfg.seed,
        )
        trainer.train(args.epochs)

        if args.test_sequences is not None:
            test_seqs = args.test_sequences
        elif os.path.isdir(seq_root):
            test_seqs = sorted(os.listdir(seq_root))
        else:
            test_seqs = []
        if test_seqs:
            # the reference pack loop: test sequences x (hold-outs + train
            # serial), CRF-14 mp4s (run_nersemble_benchmark.py:101-137)
            written = render_submission(
                model, trainer.ts.params, trainer.ts.state,
                args.root, participant, sequences=test_seqs,
                serials=[*DEFAULT_HOLD_OUT_SERIALS, train_serial],
                img_res=cfg.dataset.img_res, submit_dir=args.out,
                render_cfg=common.render_config(cfg), crf=args.crf,
            )
        else:
            # legacy single-sequence layout: per-serial hold-out videos
            from fateavatar_tpu.benchmark.nersemble import (
                render_hold_out_serials,
            )

            written = render_hold_out_serials(
                model, trainer.ts.params, trainer.ts.state,
                args.root, participant, DEFAULT_HOLD_OUT_SERIALS,
                cfg.dataset.img_res, os.path.join(args.out, participant),
                common.render_config(cfg),
            )
        print(f"[{participant}] wrote {len(written)} submission videos "
              f"-> {args.out}")


if __name__ == "__main__":
    main()
