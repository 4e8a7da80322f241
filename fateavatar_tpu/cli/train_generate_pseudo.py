"""Stage-2a pseudo-view generation CLI (train_generate_pseudo.py:15-107).

Runs the pseudo-view pipeline over a trained avatar. The GAN-inversion
provider is pluggable; without external weights the built-in mirror
provider keeps the pipeline runnable (see completion/pseudo.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--workspace", type=str, required=True)
    parser.add_argument("--num_views", type=int, default=30)
    parser.add_argument("--orbit_radius", type=float, default=2.7)
    parser.add_argument("--bisenet_weights", type=str, default=None,
                        help="face-parsing.PyTorch 79999_iter.pth; enables "
                             "native BiSeNet head masks for stage 8")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from fateavatar_tpu.cli import common
    from fateavatar_tpu.completion.pseudo import (
        PseudoGenerator, PseudoGeneratorConfig,
    )
    from fateavatar_tpu.train.loader import Loader
    from fateavatar_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    cfg.workspace = args.workspace

    identity = common.load_identity_info(args.workspace)
    train_ds, _ = common.construct_datasets(cfg)
    flame = common.construct_flame(cfg, train_ds)
    model, params0, state0 = common.construct_model(cfg, flame)
    loader = Loader(model, params0, state0, args.workspace,
                    render_cfg=common.render_config(cfg))

    matting_fn = None
    if args.bisenet_weights:
        from fateavatar_tpu.completion.segmentation import (
            load_bisenet_from_torch, make_bisenet_matting_fn,
        )

        matting_fn = make_bisenet_matting_fn(
            load_bisenet_from_torch(args.bisenet_weights)
        )

    gen = PseudoGenerator(
        model, loader.params, loader.state,
        PseudoGeneratorConfig(
            num_views=args.num_views,
            orbit_radius=args.orbit_radius,
            out_dir=f"{args.workspace}/pseudo",
        ),
        render_cfg=common.render_config(cfg),
        matting_fn=matting_fn,
    )
    gen.run(identity["fovx"], identity["fovy"])
    print(f"pseudo views written to {args.workspace}/pseudo")


if __name__ == "__main__":
    main()
