"""Sweep render-config knobs on the full train step (one process, one
device claim) — the tunnel-friendly way to compare configurations."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.ops.camera import make_camera
    from fateavatar_tpu.render.render import RenderConfig
    from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import (
        Frame, MaintenanceConfig, init_train_state, make_train_step,
    )
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    res, tex, capacity = 512, 256, 70_000
    flame = synthetic_flame(n_verts=512, n_shape=8, n_exp=6, seed=0)
    mesh = sphere_obj_mesh(512)
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity,
                           img_height=res, img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(mesh, flame, cfg)
    loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0,
                                                  dssim_weight=0.25))
    opt = fateavatar_optimizers({})
    maint = MaintenanceConfig(densify_interval=10**9, prune_interval=10**9,
                              opacity_reset_interval=10**9)
    rng = np.random.default_rng(0)
    frame = Frame(
        expression=jnp.zeros((6,), jnp.float32),
        flame_pose=jnp.zeros((15,), jnp.float32),
        camera=make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                           0.8, 0.8, res, res),
        rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
        bg_color=jnp.ones(3),
    )

    n_splats = 70_000
    variants = [
        ("2N aligned", RenderConfig(max_tiles_per_gaussian=16,
                                    instance_budget=2 * n_splats)),
        ("2N compact", RenderConfig(max_tiles_per_gaussian=16,
                                    instance_budget=2 * n_splats,
                                    layout="compact")),
    ]

    for name, rc in variants:
        step = make_train_step(model, loss_fn, opt, maint, rc)
        ts = init_train_state(params, state, opt)
        try:
            for _ in range(3):
                ts, aux = step(ts, frame)
            jax.block_until_ready(aux["loss"])
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                ts, aux = step(ts, frame)
            jax.block_until_ready(aux["loss"])
            dt = (time.perf_counter() - t0) / n
            if dt < 1e-3:
                print(f"{name:16s}  IMPLAUSIBLE ({dt*1e3:.3f} ms) — tunnel drop")
            else:
                print(f"{name:16s}  {1e3*dt:7.2f} ms/step  "
                      f"({1/dt:5.2f} it/s)  overflow={int(aux['overflow'])}")
        except Exception as e:
            print(f"{name:16s}  FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
