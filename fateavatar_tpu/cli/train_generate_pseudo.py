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
    parser.add_argument("--orbit_radius", type=float, default=None,
                        help="orbit camera distance; default = the "
                             "subject's own camera z distance (the "
                             "reference orbits at gs_camera_radius = "
                             "camera_translation[-1], completion.py:101 — "
                             "NOT the EG3D GAN-space 2.7)")
    parser.add_argument("--bisenet_weights", type=str, default=None,
                        help="face-parsing.PyTorch 79999_iter.pth; enables "
                             "native BiSeNet head masks for stage 8")
    parser.add_argument("--eg3d_weights", type=str, default=None,
                        help="EG3D/PanoHead-family G_ema state_dict "
                             "(.pth/.npz); enables the real PTI GAN-"
                             "inversion provider for stage 5/6")
    parser.add_argument("--gfpgan_weights", type=str, default=None,
                        help="GFPGANv1.3/1.4 checkpoint; enables native "
                             "face restoration for stage 4")
    parser.add_argument("--modnet_weights", type=str, default=None,
                        help="MODNet portrait-matting checkpoint; enables "
                             "native matting for stage 8 (takes precedence "
                             "over --bisenet_weights for the matte)")
    parser.add_argument("--pti_w_steps", type=int, default=200)
    parser.add_argument("--pti_g_steps", type=int, default=200)
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
    if args.modnet_weights:
        from fateavatar_tpu.completion.matting import (
            MODNetMatting, load_modnet_from_torch,
        )

        matting_fn = MODNetMatting(load_modnet_from_torch(args.modnet_weights))
    elif args.bisenet_weights:
        from fateavatar_tpu.completion.segmentation import (
            load_bisenet_from_torch, make_bisenet_matting_fn,
        )

        matting_fn = make_bisenet_matting_fn(
            load_bisenet_from_torch(args.bisenet_weights)
        )

    provider = None
    if args.eg3d_weights:
        from fateavatar_tpu.completion.eg3d import (
            PTIConfig, load_eg3d_from_torch,
        )
        from fateavatar_tpu.completion.eg3d.provider import EG3DPseudoProvider
        from fateavatar_tpu.train.losses import load_vgg16_from_torch

        if args.eg3d_weights.endswith(".pkl"):
            # the official SphereHead/PanoHead pickle, ingested directly
            # (no source-repo import; reference train/completion.py:592)
            from fateavatar_tpu.completion.eg3d.pkl_ingest import (
                load_eg3d_from_pkl,
            )
            g_params, g_cfg, _ = load_eg3d_from_pkl(args.eg3d_weights)
        else:
            g_params, g_cfg = load_eg3d_from_torch(args.eg3d_weights)
        vgg = None
        if cfg.assets.vgg16_weights_path:
            vgg = load_vgg16_from_torch(cfg.assets.vgg16_weights_path)
        provider = EG3DPseudoProvider(
            g_params, g_cfg,
            PTIConfig(w_steps=args.pti_w_steps, pti_steps=args.pti_g_steps),
            vgg_params=vgg, log_fn=print,
        )

    restorer_fn = None
    if args.gfpgan_weights:
        from fateavatar_tpu.completion.restoration import (
            GFPGANRestorer, load_gfpgan_from_torch,
        )

        g_params, g_cfg, _ = load_gfpgan_from_torch(args.gfpgan_weights)
        restorer_fn = GFPGANRestorer(g_params, g_cfg)

    orbit_radius = args.orbit_radius
    if orbit_radius is None:
        # reference: gs_camera_radius = camera_translation[-1]
        # (completion.py:101) — orbit at the SUBJECT's capture distance so
        # the face size in orbit renders matches the training footage
        orbit_radius = abs(float(identity["world_mat0"][2][3]))
    gen = PseudoGenerator(
        model, loader.params, loader.state,
        PseudoGeneratorConfig(
            num_views=args.num_views,
            orbit_radius=orbit_radius,
            out_dir=f"{args.workspace}/pseudo",
            # the reference rejects crops whose face is < 256 px at 512^2
            # renders (affine_util.py:99) — scale with render resolution
            min_face_size=min(identity["img_res"]) // 2,
        ),
        render_cfg=common.render_config(cfg),
        provider=provider,
        matting_fn=matting_fn,
        restorer_fn=restorer_fn,
    )
    gen.run(identity["fovx"], identity["fovy"])
    print(f"pseudo views written to {args.workspace}/pseudo")


if __name__ == "__main__":
    main()
