"""A/B the instance-gradient backward variants on the real chip at the
bench workload (512^2 / 65k splats, reference loss, maintenance live):

  sorted   — id-sorted scatter-add (round-2 default, ~1.95 ms in the step)
  grouped  — fully scatter-free: id-sort + structured [N,r0]+tail gathers
             over binning's per-gaussian kept counts (bwd_grouped)

Same scout-sized caps and scan-of-steps runner as bench.py; prints
ms/step + it/s per variant (median of windows).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import (
        FateAvatarConfig, fateavatar_forward, init_fateavatar,
    )
    from fateavatar_tpu.ops.camera import make_camera
    from fateavatar_tpu.render.autosize import make_occupancy_probe, size_caps
    from fateavatar_tpu.render.binning import tile_grid
    from fateavatar_tpu.render.render import RenderConfig
    from fateavatar_tpu.train.losses import (
        FateAvatarLoss, FateAvatarLossConfig, vgg16_random_params,
    )
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import (
        Frame, MaintenanceConfig, init_train_state, make_train_step,
    )
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    backend = jax.default_backend()
    smoke = bool(int(os.environ.get("BENCH_SMOKE", "0")))
    res = 64 if smoke else 512
    tex = 16 if smoke else 256
    capacity = 512 if smoke else 70_000
    n_verts = 96 if smoke else 512

    flame = synthetic_flame(n_verts=n_verts, n_shape=8, n_exp=6, seed=0)
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity, img_height=res,
                           img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(n_verts), flame,
                                           cfg)
    base_cfg = RenderConfig(
        impl="pallas" if backend == "tpu" else "xla",
        max_per_tile=1024, chunk=64, binning="twotier",
    )
    rng = np.random.default_rng(0)
    camera = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                         0.8, 0.8, res, res)
    tgt_expr = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
    tgt_pose = jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32)
    target = jax.jit(lambda: fateavatar_forward(
        model, params, state, tgt_expr, tgt_pose, camera,
        bg_color=jnp.ones(3),
        render_cfg=base_cfg.replace(instance_budget=0,
                                    max_tiles_per_gaussian=16),
    )["rgb_image"])()
    frame = Frame(expression=jnp.zeros((6,), jnp.float32),
                  flame_pose=jnp.zeros((15,), jnp.float32), camera=camera,
                  rgb=jnp.clip(target, 0.0, 1.0), bg_color=jnp.ones(3))

    if smoke:
        loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0))
    else:
        loss_fn = FateAvatarLoss(
            FateAvatarLossConfig(rgb_weight=1.0, vgg_weight=0.1,
                                 vgg_dtype="bfloat16"),
            vgg_params=vgg16_random_params(jax.random.PRNGKey(0)))
    opt = fateavatar_optimizers({})
    maint = MaintenanceConfig()
    START, n, windows = (8, 4, 2) if smoke else (5900, 30, 3)
    span_end = START + 2 * n + windows * n + 10

    # scout (same as bench.py)
    robust = base_cfg.replace(instance_budget=0, max_tiles_per_gaussian=16,
                              binning="onesort")
    scout_step = make_train_step(model, loss_fn, opt, maint, robust)
    probe = make_occupancy_probe(model, frame.camera)
    sts = init_train_state(params, state, opt)
    sts = sts.replace(step=jnp.asarray(START, sts.step.dtype))
    pk_t = pk_m = pk_b = 0
    i = int(START)
    while i < span_end:
        t, m, nb = probe(sts.params, sts.state, frame.expression,
                         frame.flame_pose)
        pk_t = max(pk_t, int(jax.device_get(t)))
        pk_m = max(pk_m, int(jax.device_get(m)))
        pk_b = max(pk_b, int(jax.device_get(nb)))
        for _ in range(10):
            sts, saux = scout_step(sts, frame)
        jax.block_until_ready(saux["loss"])
        i += 10
    del sts
    grid = tile_grid(res, res)
    sized = size_caps(pk_t, pk_m, capacity, grid[0] * grid[1], base_cfg,
                      big_count=pk_b)
    print(f"[autosize] budget={sized.instance_budget} "
          f"R={sized.max_tiles_per_gaussian} tail_k={sized.tail_k}",
          file=sys.stderr)

    variants = [("slim (default)", sized, u)
                for u in (1, 2, 3, 5)]
    if int(os.environ.get("AB_GROUPED", "0")):
        variants.append(("grouped (scatter-free)",
                         sized.replace(bwd_grouped=True), 1))
    if int(os.environ.get("AB_CUTOFF", "0")):
        # bit-identical early exit (cutoff <= T_EPS skips only instances
        # the keep mask drops anyway). Rejected in r1 on DENSE synthetic
        # noise (while_loop breaks Mosaic pipelining, nothing terminated);
        # re-tested here on the reachable-avatar workload where opaque
        # surfaces terminate most pixels early.
        variants = [("slim cutoff=1e-4", sized.replace(t_cutoff=1e-4), u)
                    for u in (1, 3)]
    for name, rc, unroll in variants:
        name = f"{name} unroll={unroll}"
        raw_step = make_train_step(model, loss_fn, opt, maint, rc,
                                   return_raw=True)

        @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def scan_steps(ts, k, raw_step=raw_step, unroll=unroll):
            def body(ts, _):
                ts, aux = raw_step(ts, frame)
                return ts, aux["overflow"]
            return jax.lax.scan(body, ts, None, length=k, unroll=unroll)

        ts = init_train_state(params, state, opt)
        ts = ts.replace(step=jnp.asarray(START, ts.step.dtype))
        ts, ovf = scan_steps(ts, n)       # compile + advance
        jax.block_until_ready(ovf)
        ts, ovf = scan_steps(ts, n)       # warmup
        jax.block_until_ready(ovf)
        vals, total_ovf = [], 0
        for _ in range(windows + 2):
            t0 = time.perf_counter()
            ts, ovf = scan_steps(ts, n)
            jax.block_until_ready(ovf)
            dt = time.perf_counter() - t0
            total_ovf += int(jnp.sum(ovf))
            if n / dt < 1000:
                vals.append(n / dt)
            if len(vals) >= windows:
                break
        its = statistics.median(vals) if vals else 0.0
        ms = 1000.0 / its if its else float("inf")
        print(f"{name:26s} {ms:7.2f} ms/step  {its:6.1f} it/s  "
              f"windows={[f'{v:.1f}' for v in vals]} overflow={total_ovf}")


if __name__ == "__main__":
    main()
