"""Tracking-heavy (IMAvatar-path) Trainer throughput on the real TPU.

The IMAvatar pipeline (reference train/base.py:113-235) refines per-frame
FLAME/camera rows alongside the model — every training step is a model
step PLUS a tracking-row gradient step, and test-time evaluation first
fits the test rows. This script measures that path at 512^2 / 65k splats:

  * epoch 1: per-step dispatch loop (model step + row refinement)
  * epoch 2+: the fused tracking scan-epoch (one lax.scan per epoch)
  * batched test-time tracking fit over the test frames

Usage: python scripts/validate_tpu_tracking.py [epochs] [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(epochs: int = 3, frames: int = 50):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import (
        FateAvatarConfig, fateavatar_forward, init_fateavatar,
    )
    from fateavatar_tpu.ops.camera import make_camera_np
    from fateavatar_tpu.render.render import RenderConfig
    from fateavatar_tpu.train.datasets import SyntheticDataset
    from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import MaintenanceConfig
    from fateavatar_tpu.train.trainer import Trainer
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    # SMOKE=1: tiny CPU shapes to validate the harness logic only
    smoke = bool(int(os.environ.get("SMOKE", "0")))
    res, tex, capacity = (64, 16, 512) if smoke else (512, 256, 70_000)
    n_verts = 96 if smoke else 512
    backend = jax.default_backend()
    flame = synthetic_flame(n_verts=n_verts, n_shape=8, n_exp=6, seed=0)
    mesh = sphere_obj_mesh(n_verts)
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity, img_height=res,
                           img_width=res, normal_offset=0.02)
    render_cfg = RenderConfig(
        impl="pallas" if backend == "tpu" else "xla",
        max_per_tile=256 if smoke else 1024, chunk=32 if smoke else 64,
        instance_budget=4 * capacity if smoke else 2 * capacity,
        max_tiles_per_gaussian=12, binning="twotier",
    )

    # ground-truth avatar renders as reachable targets
    model, gt_params, gt_state = init_fateavatar(mesh, flame, cfg)
    rng = np.random.default_rng(7)
    gt_params = gt_params.replace(
        features_dc=jnp.asarray(
            rng.uniform(-1.2, 1.2, gt_params.features_dc.shape), jnp.float32),
        opacity=jnp.full_like(gt_params.opacity, 2.0),
    )
    ds = SyntheticDataset(num_frames=frames, img_res=(res, res), n_shape=8,
                          n_exp=6, seed=1)
    ds.optimize_tracking = True           # the IMAvatar dataset contract
    test_ds = SyntheticDataset(num_frames=8, img_res=(res, res), n_shape=8,
                               n_exp=6, seed=2)
    test_ds.optimize_tracking = True

    gt_render = jax.jit(lambda e, p, cam: fateavatar_forward(
        model, gt_params, gt_state, e, p, cam,
        bg_color=jnp.ones(3), render_cfg=render_cfg)["rgb_image"])
    t0 = time.perf_counter()
    for d in (ds, test_ds):
        for i in range(len(d)):
            s = d.sample(i)
            cam_pose = np.asarray(s["cam_pose"], np.float32)
            cam = make_camera_np(cam_pose[:3, :3].T, cam_pose[:3, 3],
                                 s["fovx"], s["fovy"], res, res)
            img = gt_render(jnp.asarray(s["expression"]),
                            jnp.asarray(s["flame_pose"]), cam)
            d._images[i] = np.asarray(img)
    print(f"[gt] rendered {frames}+{len(test_ds)} target frames in "
          f"{time.perf_counter() - t0:.1f}s")

    model2, params, state = init_fateavatar(mesh, flame, cfg)
    tr = Trainer(
        name="tpu_tracking", model=model2, params=params, state=state,
        loss_fn=FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0,
                                                    dssim_weight=0.25)),
        optimizer=fateavatar_optimizers({}),
        train_dataset=ds, test_dataset=test_ds, workspace=None,
        maint_cfg=MaintenanceConfig(densify_interval=150, prune_interval=200,
                                    opacity_reset_interval=10**9,
                                    increase_num=1000,
                                    max_points_num=capacity),
        render_cfg=render_cfg, snapshot_interval=10**9, scan_unroll=3,
    )
    assert tr.tracking_enabled
    for _ in range(epochs):
        tr.epoch += 1
        tr.train_epoch()

    # batched test-time tracking fit (train/base.py:198-235): fit the test
    # rows before evaluation. First call pays the compile; second is warm.
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        tr.optimize_tracking(optim_epoch=3, batch=8)
        dt = time.perf_counter() - t0
        n_fit = 3 * len(test_ds)
        print(f"[test-fit {label}] {n_fit} row steps in {dt:.1f}s "
              f"({n_fit / max(dt, 1e-9):.1f} it/s, batch=8)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
