"""Record fixed-seed activation fixtures for the five network ports.

With real pretrained weights unavailable in this environment, the per-net
numerics are pinned two ways: torch-oracle tests of each building block
(tests/test_block_oracles.py) and THESE recorded full-forward activations
on fixed-seed random params — any refactor that changes conv/FIR/norm
ordering breaks the fixture comparison (tests/test_net_activations.py).

Usage: JAX_PLATFORMS=cpu python scripts/record_net_activations.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compute_all():
    import jax
    import jax.numpy as jnp

    rec = {}

    # --- EG3D (tiny config): mapping w, tri-plane stats, full render ---
    from fateavatar_tpu.completion.eg3d.networks import (
        eg3d_camera_label, eg3d_random_params, mapping_network, render_full,
        synthesis_backbone, tiny_test_config,
    )

    cfg = tiny_test_config()
    p = eg3d_random_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -2.7
    label = jnp.asarray(eg3d_camera_label(c2w))[None]
    w = mapping_network(p, cfg, z, label)
    planes = synthesis_backbone(p, cfg, w)
    out = render_full(p, cfg, z, label)
    rec["eg3d_w"] = np.asarray(w)
    rec["eg3d_planes"] = np.asarray(planes)
    rec["eg3d_image"] = np.asarray(out["image"])

    # --- GFPGAN (tiny config) ---
    from fateavatar_tpu.completion.restoration import (
        gfpgan_random_params, gfpgan_restore, tiny_gfpgan_config,
    )

    gcfg = tiny_gfpgan_config()
    gp = gfpgan_random_params(jax.random.PRNGKey(2), gcfg)
    gx = jax.random.uniform(jax.random.PRNGKey(3),
                            (1, gcfg.out_size, gcfg.out_size, 3))
    rec["gfpgan_out"] = np.asarray(gfpgan_restore(gp, gcfg, gx))

    # --- BiSeNet ---
    from fateavatar_tpu.completion.segmentation import (
        bisenet_forward, init_bisenet,
    )

    bp = init_bisenet(0)
    bx = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    logits = bisenet_forward(bp, bx)
    logits = logits[0] if isinstance(logits, tuple) else logits
    rec["bisenet_logits"] = np.asarray(logits)

    # --- MODNet ---
    from fateavatar_tpu.completion.matting import (
        modnet_matte, modnet_random_params,
    )

    mp = modnet_random_params(jax.random.PRNGKey(5))
    mx = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))
    rec["modnet_matte"] = np.asarray(modnet_matte(mp, mx))

    # --- VGG16 perceptual stack (block outputs) ---
    from fateavatar_tpu.train.losses import vgg16_features, vgg16_random_params

    vp = vgg16_random_params(jax.random.PRNGKey(7))
    vx = jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 64, 3))
    for k, f in enumerate(vgg16_features(vp, vx)):
        rec[f"vgg_block{k}"] = np.asarray(f)

    # --- LPIPS (both backbones) ---
    from fateavatar_tpu.train.lpips import lpips_distance, lpips_random_params

    for backbone in ("alex", "vgg"):
        lp = lpips_random_params(jax.random.PRNGKey(9), backbone)
        a = jax.random.uniform(jax.random.PRNGKey(10), (1, 64, 64, 3)) * 2 - 1
        b = jax.random.uniform(jax.random.PRNGKey(11), (1, 64, 64, 3)) * 2 - 1
        rec[f"lpips_{backbone}"] = np.asarray(lpips_distance(lp, a, b))

    return rec


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    rec = compute_all()
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                       "net_activations.npz")
    np.savez_compressed(out, **rec)
    for k, v in sorted(rec.items()):
        print(f"{k}: shape={np.shape(v)}")
    print("saved", out)


if __name__ == "__main__":
    main()
