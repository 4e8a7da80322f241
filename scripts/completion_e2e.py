"""Chain the COMPLETION pipeline end-to-end on one device (VERDICT r4
item 4): the reference's actual full-head workflow
(train_generate_pseudo.py:76-102 -> train_full_avatar.py:100-108) as ONE
run, not stage islands —

  stage A  train_mono_avatar      2 epochs on a synthetic 512^2 subject
  stage B  synthetic EG3D weights at EG3DConfig() production shape
           (random init through the port's own param spec; identical
           FLOPs/memory traffic to pretrained — timings transfer)
  stage C  train_generate_pseudo  orbit render -> exact keypoints -> FFHQ
           align -> EG3D PTI provider (200 W + 200 G steps) -> paste-back
           -> masks -> heatmap check
  stage D  train_full_avatar      add_default_points + real/pseudo
           interleaved finetune + orbit videos

Records per-stage wall times, the heatmap-check summary, and a 360-degree
render strip (docs/artifacts/completion_strip_r<N>.png) into the
``completion_e2e`` section of BENCH_SWEEP_r<N>.json (BENCH_ROUND env var).

Usage (on the chip): python scripts/completion_e2e.py
      smoke (CPU):    JAX_PLATFORMS=cpu python scripts/completion_e2e.py \
                          --res 64 --views 4 --pti 2 --tex 16 --cap 2048
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-root", default="/tmp/fav_e2e")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--tex", type=int, default=256)
    ap.add_argument("--cap", type=int, default=70_000)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--pti", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    import jax

    from scripts.make_verify_assets import main as make_assets

    backend = jax.default_backend()
    t_all = time.perf_counter()
    stages = {}
    section = {"backend": backend, "res": args.res, "views": args.views,
               "pti_steps": f"{args.pti}+{args.pti}", "stages": stages}

    def staged(name, fn):
        t0 = time.perf_counter()
        out = fn() or {}
        stages[name] = {"wall_s": round(time.perf_counter() - t0, 1), **out}
        print(f"[e2e] {name}: {stages[name]}")

    n_verts = 96 if args.res <= 64 else 512
    cfg_path = make_assets(args.out_root, res=args.res, n_verts=n_verts,
                           n_frames=args.frames)
    ws = os.path.join(args.out_root, "workspace")
    overrides = [
        f"model.tex_size={args.tex}",
        f"training.max_points_num={args.cap}",
        "training.densify_interval=10",
        "training.prune_interval=14",
        f"render.impl={'pallas' if backend == 'tpu' else 'xla'}",
        f"render.max_per_tile={1024 if args.res >= 256 else 256}",
    ]

    # ---- stage A: monocular avatar --------------------------------------
    def stage_a():
        from fateavatar_tpu.cli.train_mono_avatar import main as train_mono
        train_mono(["--config", cfg_path, "--epochs", str(args.epochs)]
                   + overrides)

    staged("A_train_mono_avatar", stage_a)

    # ---- stage B: synthetic EG3D generator at production shape ----------
    eg3d_path = os.path.join(args.out_root, "g_ema_synthetic.npz")

    def stage_b():
        import jax.random as jr

        from fateavatar_tpu.completion.eg3d.networks import (
            EG3DConfig, eg3d_random_params, tiny_test_config,
        )

        cfg = EG3DConfig() if args.res >= 256 else tiny_test_config()
        params = eg3d_random_params(jr.PRNGKey(0), cfg)
        np.savez(eg3d_path, **{k: np.asarray(v) for k, v in params.items()})
        n = sum(int(np.asarray(v).size) for v in params.values())
        return {"params_m": round(n / 1e6, 1),
                "backbone": cfg.backbone_resolution, "sr": cfg.sr_resolution}

    staged("B_synthesize_eg3d_weights", stage_b)

    # ---- stage C: pseudo-view generation with the PTI provider ----------
    def stage_c():
        from fateavatar_tpu.cli.train_generate_pseudo import main as gen_pseudo
        gen_pseudo([
            "--config", cfg_path, "--workspace", ws,
            "--num_views", str(args.views),
            "--eg3d_weights", eg3d_path,
            "--pti_w_steps", str(args.pti),
            "--pti_g_steps", str(args.pti),
        ] + overrides)
        # heatmap-check output (stage 9, completion/pseudo.py:388-402)
        heat_dir = os.path.join(ws, "pseudo", "heatmap")
        heat = (sorted(os.listdir(heat_dir))
                if os.path.isdir(heat_dir) else [])
        imgs = os.path.join(ws, "pseudo", "image")
        n_img = len(os.listdir(imgs)) if os.path.isdir(imgs) else 0
        return {"pseudo_images": n_img, "heatmaps": len(heat)}

    staged("C_train_generate_pseudo", stage_c)

    # ---- stage D: full-head finetune + orbit videos ----------------------
    def stage_d():
        from fateavatar_tpu.cli.train_full_avatar import main as full_avatar
        full_avatar(["--config", cfg_path, "--workspace", ws,
                     "--finetune_epochs", "1"] + overrides)
        # write_video falls back to an animated GIF when no ffmpeg binary
        # is present (utils/logging.py:85) — count either container
        orbit = os.path.join(ws, "media", "fullhead_orbit")
        written = [ext for ext in (".mp4", ".gif")
                   if os.path.exists(orbit + ext)]
        return {"orbit_video": written[0] if written else None}

    staged("D_train_full_avatar", stage_d)

    # ---- 360-degree strip artifact ---------------------------------------
    def strip():
        from fateavatar_tpu.cli import common
        from fateavatar_tpu.completion.camera_sampler import orbit_cameras
        from fateavatar_tpu.models import fateavatar_forward
        from fateavatar_tpu.train.loader import Loader
        from fateavatar_tpu.utils.config import load_config
        from fateavatar_tpu.utils.logging import save_image
        import jax.numpy as jnp

        cfg = load_config(cfg_path, overrides)
        cfg.workspace = ws
        identity = common.load_identity_info(ws)
        train_ds, _ = common.construct_datasets(cfg)
        flame = common.construct_flame(cfg, train_ds)
        model, params0, state0 = common.construct_model(cfg, flame)
        loader = Loader(model, params0, state0, ws,
                        render_cfg=common.render_config(cfg))
        n = 8
        # orbit at the subject's capture distance (completion.py:101), not
        # the EG3D GAN-space 2.7 — see train_generate_pseudo --orbit_radius
        radius = abs(float(identity["world_mat0"][2][3]))
        cams, _ = orbit_cameras(n, np.zeros(3), radius,
                                identity["fovx"], identity["fovy"],
                                args.res, args.res)
        cols = []
        for cam in cams:
            img = fateavatar_forward(
                model, loader.params, loader.state,
                jnp.zeros((train_ds.n_exp,), jnp.float32),
                jnp.zeros((15,), jnp.float32), cam,
                render_cfg=common.render_config(cfg))["rgb_image"]
            cols.append(np.asarray(img))
        strip_img = np.concatenate(cols, axis=1)
        round_id = os.environ.get("BENCH_ROUND", "0")
        out_png = os.path.join(REPO, "docs", "artifacts",
                               f"completion_strip_r{round_id}.png")
        os.makedirs(os.path.dirname(out_png), exist_ok=True)
        save_image(out_png, strip_img)
        return {"strip": os.path.relpath(out_png, REPO), "views": n}

    staged("E_orbit_strip", strip)

    section["total_wall_s"] = round(time.perf_counter() - t_all, 1)

    round_id = os.environ.get("BENCH_ROUND", "0")
    out_path = os.path.join(REPO, f"BENCH_SWEEP_r{round_id}.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    results["completion_e2e"] = section
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[artifact] {out_path} += completion_e2e "
          f"(total {section['total_wall_s']}s)")


if __name__ == "__main__":
    main()
