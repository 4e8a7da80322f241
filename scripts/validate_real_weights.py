"""Real-weight readiness drill: one command per network port.

The five network ports (EG3D/SphereHead, GFPGAN, BiSeNet, MODNet,
VGG16/LPIPS) are pinned in-repo by torch block oracles and fixed-seed
random-weight activation fixtures (docs/TESTING.md). This environment
cannot fetch the published checkpoints (zero egress), so the day real
weights ARE available, this script is the one-command validation
(VERDICT r2 item #9): point it at a weights directory laid out like the
reference's ``weights/`` (README.md:75-84 download table) and it runs,
per present checkpoint:

  1. conversion through the same loader the pipeline uses,
  2. a key-coverage audit (every checkpoint tensor consumed or explicitly
     on the loader's documented drop list — the class of bug that
     random-weight fixtures cannot catch: a missed buffer silently keeps
     its random init),
  3. a jitted production-shape forward with finiteness + output-range
     checks,
  4. a recorded real-weight activation fixture
     (``<weights>/fixtures_real/<port>.npz``) so later refactors can be
     regression-checked against the real numerics with
     ``--compare <fixtures_dir>``.

Exits nonzero if any present checkpoint fails; ports whose files are
absent are reported SKIPPED (the drill is per-file, not all-or-nothing).

Expected filenames (reference README.md:75-84):
  spherehead-ckpt-025000.pkl | fintuned_generator.pkl   (EG3D tri-grid)
  GFPGANv1.3.pth | GFPGANv1.4.pth
  79999_iter.pth                                         (BiSeNet)
  modnet_webcam_portrait_matting.ckpt | modnet_photographic_portrait_matting.ckpt
  vgg16.pt                                               (torchvision layout)
  lpips_alex.pth | lpips_vgg.pth                         (full LPIPS state dicts)

Usage:
  JAX_PLATFORMS=cpu python scripts/validate_real_weights.py /path/to/weights
  ... --compare /path/to/weights/fixtures_real   # regression vs a prior run
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _find(weights_dir, *names):
    for n in names:
        p = os.path.join(weights_dir, n)
        if os.path.exists(p):
            return p
    return None


def _finite(name, arr):
    arr = np.asarray(arr)
    if not np.isfinite(arr).all():
        raise ValueError(f"{name}: non-finite values in output "
                         f"(nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()})")
    return arr


def _torch_keys(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("params_ema", "params", "state_dict", "generator"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    return {k: tuple(v.shape) for k, v in sd.items() if hasattr(v, "detach")}


def drill_gfpgan(path, record):
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.completion.restoration import (
        GFPGANConfig, gfpgan_restore, load_gfpgan_from_torch,
    )

    params, cfg, unused = load_gfpgan_from_torch(path)
    ckpt = _torch_keys(path)
    consumed = set(params) - set(unused)
    dropped = sorted(set(ckpt) - consumed)
    # the loader documents exactly which families it drops (noise buffers,
    # per-resolution toRGB skips the clean arch does not use)
    undocumented = [k for k in dropped
                    if ".noise" not in k and "toRGB" not in k
                    and "stylegan_decoder.noises" not in k]
    if undocumented:
        raise ValueError(f"GFPGAN: {len(undocumented)} checkpoint tensors "
                         f"not consumed and not on the documented drop list:"
                         f" {undocumented[:8]}")
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (1, cfg.out_size, cfg.out_size, 3))
    out = _finite("gfpgan", jax.jit(
        lambda p, v: gfpgan_restore(p, cfg, v))(params, x))
    if not (-2.0 <= out.min() and out.max() <= 2.0):
        raise ValueError(f"GFPGAN output range implausible: "
                         f"[{out.min():.2f}, {out.max():.2f}]")
    record["gfpgan_out"] = out
    return (f"512^2 restore ok, out range [{out.min():.3f}, {out.max():.3f}],"
            f" {len(dropped)} documented drops")


def drill_bisenet(path, record):
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.completion.segmentation import (
        bisenet_forward, load_bisenet_from_torch,
    )

    params = load_bisenet_from_torch(path)      # strict shape table inside
    ckpt = _torch_keys(path)
    dropped = sorted(set(ckpt) - set(params))
    undocumented = [k for k in dropped
                    if "num_batches_tracked" not in k
                    and not k.startswith(("cp.conv_out16", "cp.conv_out32"))]
    if undocumented:
        raise ValueError(f"BiSeNet: undocumented unconsumed tensors: "
                         f"{undocumented[:8]}")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3))
    logits = bisenet_forward(params, x)
    logits = logits[0] if isinstance(logits, tuple) else logits
    logits = _finite("bisenet", logits)
    n_classes = np.unique(np.argmax(logits, -1)).size
    record["bisenet_logits"] = logits[:, ::8, ::8]
    return (f"512^2 parse ok, logits {logits.shape}, "
            f"{n_classes} classes active on noise input")


def drill_modnet(path, record):
    import jax

    from fateavatar_tpu.completion.matting import (
        load_modnet_from_torch, modnet_matte, modnet_random_params,
    )

    params = load_modnet_from_torch(path)
    ckpt = _torch_keys(path)
    stripped = {(k[len("module."):] if k.startswith("module.") else k)
                for k in ckpt}
    # the loader passes EVERY checkpoint tensor through verbatim, so audit
    # against the port's expected key table (modnet_random_params builds
    # checkpoint-exact names): an extra tensor means the architecture has
    # a branch our port ignores; a missing one means forward would KeyError
    expected = set(modnet_random_params(jax.random.PRNGKey(0)))
    extra = sorted(k for k in stripped - expected
                   if "num_batches_tracked" not in k)
    missing = sorted(expected - stripped)
    if extra or missing:
        raise ValueError(f"MODNet key audit: {len(extra)} checkpoint tensors"
                         f" unknown to the port {extra[:8]}, "
                         f"{len(missing)} expected tensors absent "
                         f"{missing[:8]}")
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 512, 512, 3))
    matte = _finite("modnet", modnet_matte(params, x))
    if not (0.0 <= matte.min() and matte.max() <= 1.0):
        raise ValueError(f"MODNet matte out of [0,1]: "
                         f"[{matte.min():.3f}, {matte.max():.3f}]")
    record["modnet_matte"] = matte[:, ::8, ::8]
    return f"512^2 matte ok, mean {matte.mean():.3f}"


def drill_vgg16(path, record):
    import jax

    from fateavatar_tpu.train.losses import load_vgg16_from_torch, vgg16_features

    from fateavatar_tpu.train.losses import _VGG_CFG

    params = load_vgg16_from_torch(path)
    n_convs = sum(1 for v in _VGG_CFG if v != "M")  # 4-block truncated stack
    if len(params) != n_convs:
        raise ValueError(f"VGG16: expected {n_convs} conv layers, "
                         f"got {len(params)}")
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 224, 224, 3))
    feats = vgg16_features(params, x)
    for k, f in enumerate(feats):
        record[f"vgg_block{k}"] = _finite(f"vgg block{k}", f)[:, ::4, ::4]
    return f"224^2 forward ok, {len(feats)} block outputs"


def drill_lpips(path, record, backbone):
    import jax

    from fateavatar_tpu.train.lpips import lpips_distance, load_lpips_from_torch

    params = load_lpips_from_torch(path, backbone=backbone)
    a = jax.random.uniform(jax.random.PRNGKey(4), (1, 256, 256, 3)) * 2 - 1
    b = jax.random.uniform(jax.random.PRNGKey(5), (1, 256, 256, 3)) * 2 - 1
    d_ab = float(_finite("lpips", lpips_distance(params, a, b)))
    d_aa = float(_finite("lpips", lpips_distance(params, a, a)))
    if not (abs(d_aa) < 1e-5 and d_ab > 0):
        raise ValueError(f"LPIPS invariants violated: d(a,a)={d_aa}, "
                         f"d(a,b)={d_ab}")
    record[f"lpips_{backbone}"] = np.asarray([d_ab])
    return f"d(a,a)={d_aa:.2e}, d(a,b)={d_ab:.4f}"


def drill_eg3d(path, record):
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.completion.eg3d.networks import (
        eg3d_camera_label, render_full,
    )
    from fateavatar_tpu.completion.eg3d.pkl_ingest import load_eg3d_from_pkl

    params, cfg, attrs = load_eg3d_from_pkl(path)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.z_dim))
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -2.7
    label = jnp.asarray(eg3d_camera_label(c2w))[None]
    out = render_full(params, cfg, z, label)
    img = _finite("eg3d image", out["image"])
    record["eg3d_image"] = img
    record["eg3d_raw"] = _finite("eg3d raw", out.get("image_raw", img))
    return (f"config {cfg.backbone_resolution}->{cfg.superres_resolution} "
            f"render ok, img {img.shape} range "
            f"[{img.min():.2f}, {img.max():.2f}]")


PORTS = [
    ("eg3d", drill_eg3d,
     ("spherehead-ckpt-025000.pkl", "fintuned_generator.pkl")),
    ("gfpgan", drill_gfpgan, ("GFPGANv1.3.pth", "GFPGANv1.4.pth")),
    ("bisenet", drill_bisenet, ("79999_iter.pth",)),
    ("modnet", drill_modnet, ("modnet_webcam_portrait_matting.ckpt",
                              "modnet_photographic_portrait_matting.ckpt")),
    ("vgg16", drill_vgg16, ("vgg16.pt", "vgg16.npz")),
    ("lpips_alex", lambda p, r: drill_lpips(p, r, "alex"),
     ("lpips_alex.pth", "lpips_alex.npz")),
    ("lpips_vgg", lambda p, r: drill_lpips(p, r, "vgg"),
     ("lpips_vgg.pth", "lpips_vgg.npz")),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("weights_dir")
    ap.add_argument("--compare", default=None,
                    help="fixtures dir from a prior run; outputs must match "
                         "to 1e-4 (refactor regression check)")
    ap.add_argument("--ports", default=None,
                    help="comma-separated subset (default: all present)")
    args = ap.parse_args()

    only = set(args.ports.split(",")) if args.ports else None
    fix_dir = os.path.join(args.weights_dir, "fixtures_real")
    os.makedirs(fix_dir, exist_ok=True)

    failures, ran = [], 0
    for name, fn, filenames in PORTS:
        if only and name not in only:
            continue
        path = _find(args.weights_dir, *filenames)
        if path is None:
            print(f"[SKIP] {name:11s} none of {filenames} present")
            continue
        record = {}
        try:
            msg = fn(path, record)
            if args.compare:
                ref = np.load(os.path.join(args.compare, f"{name}.npz"))
                for k in ref.files:
                    np.testing.assert_allclose(
                        np.asarray(record[k]), ref[k], atol=1e-4,
                        err_msg=f"{name}/{k} drifted vs recorded fixture")
                msg += " | matches recorded fixture"
            np.savez_compressed(os.path.join(fix_dir, f"{name}.npz"),
                                **{k: np.asarray(v)
                                   for k, v in record.items()})
            print(f"[ OK ] {name:11s} {os.path.basename(path)}: {msg}")
            ran += 1
        except Exception as e:  # noqa: BLE001 — report-all drill
            traceback.print_exc()
            print(f"[FAIL] {name:11s} {os.path.basename(path)}: {e}")
            failures.append(name)

    print(f"\n{ran} port(s) validated, {len(failures)} failed"
          + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
