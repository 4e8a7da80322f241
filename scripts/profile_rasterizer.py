"""Stage-by-stage rasterizer timing on the current backend.

Usage: python scripts/profile_rasterizer.py [n_gaussians] [res]
Breaks the render into preprocess / binning / gather / blend fwd / full fwd /
fwd+bwd and prints ms per stage — the measurement loop for kernel tuning.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.ops.camera import make_camera
    from fateavatar_tpu.render import binning
    from fateavatar_tpu.render.blend_tiles import blend_tiles_pallas, blend_tiles_xla
    from fateavatar_tpu.render.preprocess import preprocess
    from fateavatar_tpu.render.render import RenderConfig, render
    from fateavatar_tpu.render.splats import make_gaussians
    from fateavatar_tpu.utils.profiling import time_fn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    backend = jax.default_backend()
    print(f"backend={backend} n={n} res={res}")

    rng = np.random.default_rng(0)
    xyz = np.concatenate(
        [rng.uniform(-0.25, 0.25, (n, 2)), rng.uniform(0.6, 1.4, (n, 1))], 1
    )
    g = make_gaussians(
        xyz=xyz,
        scaling=np.log(rng.uniform(0.002, 0.01, (n, 3))),
        rotation=rng.normal(size=(n, 4)),
        opacity=rng.normal(size=(n, 1)),
        features_dc=rng.normal(size=(n, 1, 3)) * 0.3,
    )
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, res, res)
    bg = jnp.zeros(3)
    grid = binning.tile_grid(res, res)
    cfg = RenderConfig(impl="pallas" if backend == "tpu" else "xla")

    prep_fn = jax.jit(lambda g: preprocess(
        cam, g.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_features, 0, alive=g.alive))
    prep = prep_fn(g)
    print(f"preprocess:        {1e3*time_fn(prep_fn, g):8.2f} ms")
    print(f"visible: {int(jnp.sum(prep.visible))}  "
          f"mean radius: {float(jnp.mean(jnp.where(prep.visible, prep.radius, 0))):.1f}px")

    for R in (16, 36, 64):
        bin_fn = jax.jit(lambda p: binning.build_tile_lists(
            p.mean2d, p.depth, p.radius, grid,
            max_per_tile=cfg.max_per_tile, max_tiles_per_gaussian=R))
        lists = bin_fn(prep)
        t = time_fn(bin_fn, prep)
        print(f"binning (R={R:3d}):  {1e3*t:8.2f} ms  overflow={int(lists.overflow)} "
              f"max_count={int(jnp.max(lists.counts))}")

    # instance-path stages
    from fateavatar_tpu.render.blend_instances import (
        CHUNK, blend_instances_pallas,
    )

    inst_fn = jax.jit(lambda p: binning.build_instance_lists(
        p.mean2d, p.depth, p.radius, grid,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian, chunk=CHUNK))
    ilists = inst_fn(prep)
    print(f"inst binning:      {1e3*time_fn(inst_fn, prep):8.2f} ms  "
          f"overflow={int(ilists.overflow)} "
          f"M_used={int(ilists.tile_starts[-1])}")

    def pack_gather(p, instances):
        packed = jnp.concatenate([
            p.mean2d, p.conic, p.color, p.opacity[:, None],
            jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 6), jnp.float32),
        ], -1)
        packed = jnp.concatenate([packed, jnp.zeros((1, 16))], 0)
        ids = jnp.where(instances >= 0, instances, n)
        return jnp.take(packed, ids, axis=0).T

    pg_fn = jax.jit(pack_gather)
    inst_data = pg_fn(prep, ilists.instances)
    print(f"inst gather:       {1e3*time_fn(pg_fn, prep, ilists.instances):8.2f} ms"
          f"  shape={inst_data.shape}")

    if backend == "tpu":
        ib_fn = jax.jit(lambda d: blend_instances_pallas(
            d, ilists.tile_starts, bg, grid, False))
        _ = ib_fn(inst_data)
        print(f"inst blend fwd:    {1e3*time_fn(ib_fn, inst_data):8.2f} ms")

        ibwd_fn = jax.jit(jax.grad(lambda d: jnp.sum(blend_instances_pallas(
            d, ilists.tile_starts, bg, grid, False)[0])))
        _ = ibwd_fn(inst_data)
        print(f"inst blend f+b:    {1e3*time_fn(ibwd_fn, inst_data):8.2f} ms")

    lists = jax.jit(lambda p: binning.build_tile_lists(
        p.mean2d, p.depth, p.radius, grid,
        max_per_tile=cfg.max_per_tile,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian))(prep)

    def gather(p, ids):
        idc = jnp.maximum(ids, 0)
        return (jnp.take(p.mean2d, idc, 0), jnp.take(p.conic, idc, 0),
                jnp.take(p.color, idc, 0), jnp.take(p.opacity, idc, 0))

    gather_fn = jax.jit(gather)
    tiles = gather_fn(prep, lists.ids)
    print(f"gather:            {1e3*time_fn(gather_fn, prep, lists.ids):8.2f} ms")

    valid = (lists.ids >= 0).astype(jnp.float32)
    counts = lists.counts
    if backend == "tpu":
        blend_fn = jax.jit(lambda m, c, cl, o: blend_tiles_pallas(
            m, c, cl, o, valid, counts, bg, grid, cfg.chunk, False))
    else:
        blend_fn = jax.jit(lambda m, c, cl, o: blend_tiles_xla(
            m, c, cl, o, valid > 0, bg, grid, chunk=cfg.chunk))
    _ = blend_fn(*tiles)
    print(f"blend fwd:         {1e3*time_fn(blend_fn, *tiles):8.2f} ms")

    full_fn = jax.jit(lambda g: render(cam, g, bg, config=cfg)["render"])
    _ = full_fn(g)
    print(f"render fwd:        {1e3*time_fn(full_fn, g):8.2f} ms")

    def loss_of(diff, g):
        g2 = g.replace(xyz=diff["xyz"], scaling=diff["scaling"],
                       rotation=diff["rotation"], opacity=diff["opacity"],
                       features_dc=diff["features_dc"])
        return jnp.mean(render(cam, g2, bg, config=cfg)["render"] ** 2)

    diff0 = {"xyz": g.xyz, "scaling": g.scaling, "rotation": g.rotation,
             "opacity": g.opacity, "features_dc": g.features_dc}
    loss_fn = jax.jit(jax.grad(loss_of), static_argnums=())
    _ = loss_fn(diff0, g)
    print(f"render fwd+bwd:    {1e3*time_fn(loss_fn, diff0, g):8.2f} ms")


if __name__ == "__main__":
    main()
