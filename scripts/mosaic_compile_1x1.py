"""Compile + execute the SHARDED programs on the real TPU toolchain
(VERDICT r4 item 6).

All shard_map evidence so far (tests/test_splat_parallel.py, the driver's
dryrun_multichip) runs on XLA:CPU with virtual devices; a Mosaic/XLA:TPU
incompatibility in the composition shard_map + all_to_all + the tile blend
would surface only on real multi-chip hardware. This script runs the same
programs on the single real TPU chip with DEGENERATE meshes (1 device per
axis) — the TPU compiler still lowers the collectives and the full sharded
program, so "compiles + executes + finite outputs" here rules out the
toolchain-incompatibility class, leaving only true >1-device ICI behavior
untested (impossible in this environment).

Covers (cheapest first, so partial evidence lands even if a tunnel
compile exhausts the budget):
  * the Pallas tile blend inside a shard_map body (with a psum) and under
    GSPMD value_and_grad — the Mosaic-inside-mesh-program composition,
  * 2-D mesh train step (parallel/mesh2d.py) on a 1x1 ('data','gauss')
    mesh at 128^2 / 4.6k splats with in-jit sharded densify,
  * 2-D mesh tracking step on the same mesh,
  * splat-sharded render (parallel/splat_parallel.py) on a 1-device
    ('gauss',) mesh at MOSAIC_RES (default 512^2 / 65k splats —
    production shape; 256/128 shrink it if the tunnel compile stalls).

Appends a {"backend": "tpu", ...} section to MULTICHIP_r<N>.json
(MULTICHIP_ROUND env var, default "0").

Usage (on the chip — no JAX_PLATFORMS prefix):
  python scripts/mosaic_compile_1x1.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.models.fateavatar import build_gaussians
    from fateavatar_tpu.ops.camera import make_camera
    from fateavatar_tpu.parallel.mesh2d import (
        make_mesh2d_tracking_step, make_mesh2d_train_step, place_mesh2d,
    )
    from fateavatar_tpu.parallel.data_parallel import stack_frames
    from fateavatar_tpu.parallel.splat_parallel import render_splat_sharded
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import Frame, init_train_state
    from fateavatar_tpu.train.tracking import RowAdam, TrackingTables

    backend = jax.default_backend()
    print(f"[mosaic1x1] backend={backend} devices={jax.devices()}")
    results = {"backend": backend, "device": str(jax.devices()[0]),
               "scenarios": {}}

    only = os.environ.get("MOSAIC_ONLY", "")

    def record(name, fn):
        if only and only not in name:
            return
        t0 = time.perf_counter()
        try:
            out = fn()
            results["scenarios"][name] = {
                "ok": True, "wall_s": round(time.perf_counter() - t0, 2),
                **out}
            print(f"[mosaic1x1] {name}: ok {results['scenarios'][name]}")
        except Exception as e:  # noqa: BLE001 — artifact records the failure
            results["scenarios"][name] = {
                "ok": False, "error": f"{type(e).__name__}: {e}"}
            print(f"[mosaic1x1] {name}: FAILED {e}")

    rng = np.random.default_rng(0)

    # ---- scenario 0: Pallas blend under shard_map / GSPMD ---------------
    # The single-chip trainer already compiles the Pallas blend on TPU, but
    # never UNDER a mesh program. This is the exact composition VERDICT r4
    # item 6 calls out (shard_map + collectives + the Pallas kernel): a
    # 1-device mesh still routes the kernel through Mosaic inside the
    # sharded-program compilation path.
    def pallas_in_mesh():
        from fateavatar_tpu.render.render import RenderConfig, render
        from jax import shard_map

        res = 256
        flame = synthetic_flame(n_verts=256, n_shape=6, n_exp=4, seed=0)
        from fateavatar_tpu.utils.obj_io import sphere_obj_mesh
        mesh_obj = sphere_obj_mesh(256)
        cfg = FateAvatarConfig(tex_size=64, capacity=4096,
                               img_height=res, img_width=res,
                               normal_offset=0.02)
        model, params, state = init_fateavatar(mesh_obj, flame, cfg)
        dmesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        gaussians, _, _ = build_gaussians(
            model, params, state, jnp.zeros(6), jnp.zeros(15))
        cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                          0.8, 0.8, res, res)
        rc = RenderConfig(impl="pallas", max_per_tile=256,
                          instance_budget=4 * 4096, max_tiles_per_gaussian=8)

        def body(g):
            out = render(cam, g, jnp.ones(3), config=rc)
            # a collective in the same program, so the compiled module is
            # a real mesh program, not a degenerate single-device jit
            return jax.lax.psum(out["render"], "data")

        img = shard_map(body, mesh=dmesh, in_specs=(P(),), out_specs=P(),
                        check_vma=False)(gaussians)
        jax.block_until_ready(img)
        assert np.isfinite(np.asarray(img)).all()

        # and through GSPMD: jit with sharding-annotated inputs + grad.
        # Differentiate w.r.t. xyz only — the Gaussians pytree has a bool
        # `alive` leaf, which value_and_grad over the whole tree rejects.
        gr = jax.device_put(gaussians, NamedSharding(dmesh, P()))

        def loss(xyz):
            g = gr.replace(xyz=xyz)
            return jnp.mean(render(cam, g, jnp.ones(3), config=rc)["render"])

        t0 = time.perf_counter()
        val, grads_xyz = jax.jit(jax.value_and_grad(loss))(gr.xyz)
        jax.block_until_ready(val)
        gspmd_s = time.perf_counter() - t0
        assert np.isfinite(float(val))
        gnorm = float(jnp.linalg.norm(grads_xyz))
        assert np.isfinite(gnorm) and gnorm > 0
        return {"res": res, "gspmd_grad_compile_s": round(gspmd_s, 1),
                "grad_xyz_norm": round(gnorm, 5)}

    record("pallas_blend_in_mesh_program", pallas_in_mesh)

    # ---- scenario 1: splat-sharded render at production shape ----------
    def splat_sharded():
        res = int(os.environ.get("MOSAIC_RES", "512"))
        capacity = {512: 65_536, 256: 16_384, 128: 4_096}[res]
        flame = synthetic_flame(n_verts=512, n_shape=8, n_exp=6, seed=0)
        from fateavatar_tpu.utils.obj_io import sphere_obj_mesh
        mesh_obj = sphere_obj_mesh(512)
        tex = int(round(capacity ** 0.5))
        cfg = FateAvatarConfig(tex_size=tex, capacity=capacity,
                               img_height=res, img_width=res,
                               normal_offset=0.02)
        model, params, state = init_fateavatar(mesh_obj, flame, cfg)
        gmesh = Mesh(np.asarray(jax.devices()[:1]), ("gauss",))
        gaussians, _, _ = build_gaussians(
            model, params, state, jnp.zeros(6), jnp.zeros(15))
        g = jax.device_put(gaussians, NamedSharding(gmesh, P("gauss")))
        cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                          0.8, 0.8, res, res)
        # jit the wrapper: eager shard_map re-TRACES the full render
        # pipeline every call (~200 s of host Python per dispatch on this
        # 1-core box — the r4c run's warm_ms=200660 measured tracing, not
        # the device), so the steady-state number needs a cached program
        fn = jax.jit(lambda gg: render_splat_sharded(
            cam, gg, jnp.ones(3), gmesh,
            max_per_tile=1024, pair_budget=2 * capacity, chunk=64))
        t0 = time.perf_counter()
        img, dropped = fn(g)
        jax.block_until_ready(img)
        compile_s = time.perf_counter() - t0
        # warm re-dispatch for the steady-state number
        t0 = time.perf_counter()
        for _ in range(5):
            img, dropped = fn(g)
        jax.block_until_ready(img)
        warm_ms = (time.perf_counter() - t0) / 5 * 1e3
        assert np.isfinite(np.asarray(img)).all()
        return {"res": res, "capacity": capacity,
                "compile_s": round(compile_s, 1),
                "warm_ms": round(warm_ms, 2),
                "dropped": int(dropped)}

    # ---- scenario 2+3: 2-D mesh train + tracking steps ------------------
    def mesh2d_steps():
        res = 128
        flame = synthetic_flame(n_verts=256, n_shape=6, n_exp=4, seed=0)
        from fateavatar_tpu.utils.obj_io import sphere_obj_mesh
        mesh_obj = sphere_obj_mesh(256)
        cfg = FateAvatarConfig(tex_size=64, capacity=4096 + 512,
                               img_height=res, img_width=res,
                               normal_offset=0.02)
        model, params, state = init_fateavatar(mesh_obj, flame, cfg)
        mesh2 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                     ("data", "gauss"))
        opt = fateavatar_optimizers({})
        step = make_mesh2d_train_step(
            model, opt, mesh2, max_per_tile=128, chunk=32,
            densify_interval=1, prune_interval=2, increase_num=256)
        ts = place_mesh2d(init_train_state(params, state, opt), mesh2)
        frames = []
        for _ in range(1):
            cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                              0.8, 0.8, res, res)
            frames.append(Frame(
                expression=jnp.asarray(rng.normal(size=4) * 0.2, jnp.float32),
                flame_pose=jnp.asarray(rng.normal(size=15) * 0.05,
                                       jnp.float32),
                camera=cam,
                rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
                bg_color=jnp.ones(3)))
        batch = jax.device_put(stack_frames(frames),
                               NamedSharding(mesh2, P("data")))
        a0 = int(np.sum(jax.device_get(ts.state.alive)))
        t0 = time.perf_counter()
        ts, aux = step(ts, batch)
        loss = float(aux["loss"])
        compile_s = time.perf_counter() - t0
        a1 = int(np.sum(jax.device_get(ts.state.alive)))
        assert np.isfinite(loss), loss
        assert a1 > a0, (a0, a1)
        t0 = time.perf_counter()
        for _ in range(5):
            ts, aux = step(ts, batch)
        jax.block_until_ready(aux["loss"])
        warm_ms = (time.perf_counter() - t0) / 5 * 1e3

        # tracking adapter on the same mesh
        F = 4
        tables = TrackingTables(
            expression=jnp.zeros((F, 4)), flame_pose=jnp.zeros((F, 15)),
            cam_t=jnp.tile(jnp.asarray([0.0, 0.0, 0.4])[None], (F, 1)))
        topt = RowAdam(lr=1e-3)
        tstate = topt.init(tables)
        tstep = make_mesh2d_tracking_step(model, mesh2, topt,
                                          max_per_tile=128, chunk=32)
        fc = {
            "R": jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
            "fovx": jnp.full((1,), 0.8), "fovy": jnp.full((1,), 0.8),
            "rgb": jnp.stack([f.rgb for f in frames]),
            "bg": jnp.stack([f.bg_color for f in frames]),
        }
        fc = jax.device_put(fc, NamedSharding(mesh2, P("data")))
        t0 = time.perf_counter()
        tables, tstate, tloss = tstep(
            tables, tstate, jnp.asarray([0], jnp.int32),
            jnp.asarray([True]), ts.params, ts.state, fc)
        track_compile_s = time.perf_counter() - t0
        assert np.isfinite(float(tloss))
        return {"res": res, "loss": round(loss, 5),
                "alive": f"{a0}->{a1}",
                "compile_s": round(compile_s, 1),
                "warm_ms": round(warm_ms, 2),
                "tracking_loss": round(float(tloss), 5),
                "tracking_compile_s": round(track_compile_s, 1)}

    record("mesh2d_train_and_tracking_1x1", mesh2d_steps)

    # most expensive last so cheap evidence lands even if this one
    # exhausts the tunnel-compile budget (MOSAIC_RES to shrink it)
    _res = os.environ.get("MOSAIC_RES", "512")
    record(f"splat_sharded_render_{_res}", splat_sharded)

    round_id = os.environ.get("MULTICHIP_ROUND", "0")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"MULTICHIP_r{round_id}.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    # MERGE scenarios so a MOSAIC_ONLY re-run updates one row without
    # discarding the others' evidence
    prior = existing.get("tpu_mosaic_1x1", {})
    if prior.get("scenarios"):
        merged = dict(prior["scenarios"])
        merged.update(results["scenarios"])
        results["scenarios"] = merged
    existing["tpu_mosaic_1x1"] = results
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"[artifact] {out} += tpu_mosaic_1x1")
    if not all(s.get("ok") for s in results["scenarios"].values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
