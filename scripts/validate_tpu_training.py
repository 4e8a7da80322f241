"""Full-size Trainer validation on the real TPU: reconstruct a ground-truth
avatar at 512^2 / 65k splats THROUGH the Trainer loop (prefetch, meters,
maintenance — not the bare bench step) and report trainer-loop it/s + PSNR.

Emits ``VALIDATION_r<N>.json`` at the repo root (round from the VALIDATION_ROUND
env var, default "0"): per-epoch PSNR/loss/it-s curve + config hash — the
reproducible fidelity artifact that regresses quality round-over-round
(VERDICT r2 item #7). The run FAILS (exit 1) if the BEST epoch's PSNR falls
below the ``MIN_PSNR`` env var (default 23.5) — enforced only for runs of
>= 3 epochs (shorter runs haven't converged enough for the floor to mean
anything). Best, not final, because checkpointing keeps the best epoch and
the late opacity-reset events perturb the tiny synthetic self-fit target.

Maintenance cadence env knobs (VERDICT r4 item 2): ``DENSIFY``/``PRUNE``/
``RESET`` in steps (defaults 150/200/off = the r1-r3 stress protocol, 20x
the reference cadence); ``MAINT=0`` disables all three. The REFERENCE
cadence (config/fateavatar.yaml:46-48) is DENSIFY=3000 PRUNE=2000
RESET=60000.

Baked-fidelity gate (VERDICT r4 item 5): ``BAKE=<epochs>`` (default 0 =
skip) bakes the trained avatar into UV textures through UVBaker and
records PSNR/SSIM of render_from_texture_dict vs the source splat render
over ``BAKE_POSES`` validation poses as ``baked_psnr``/``baked_ssim`` in
the artifact; fails (exit 1) if baked_psnr < ``BAKED_MIN_PSNR``
(default 28.0 — the bake reproduces a render the splats themselves
produce, so the bar is higher than the reconstruction floor; reference
behavior: train/baker.py:120-191, model/uv_decoder.py:564-690). Two
protocol notes for the gate to be meaningful: (1) ``GT_APPEARANCE``
defaults to ``smooth`` — band-limited color over splat UV (real faces are
spatially smooth); the r1-r3 ``noise`` appearance is unbakeable by
construction at ~1 texel/splat and floors baked_psnr near 21 dB no matter
how long the bake runs. (2) the reference's "5 epochs to convergence" is
5 x ~3000 real frames ≈ 15k optimizer steps; on this 100-frame synthetic
set, step-match with BAKE=150 rather than BAKE=5 (= 500 steps).

Loss-recipe env knobs: ``SCALE_W`` (anisotropy-ratio scale loss weight,
reference 0.1), ``LAPL_W`` (laplacian delta-blendshape loss, reference
1e5), ``DSSIM_W`` (default 0.0 = the REFERENCE recipe,
config/fateavatar.yaml loss.weight.dssim_loss: 0). The r1-r3 protocol ran
DSSIM_W=0.25, and the r4 root-cause A/B (probe P1, docs/STATUS_ROUND4.md)
showed that term IS the long-horizon degradation driver: at 6500 steps it
rewards blur, growing splat scales ~5x (p99 0.0005->0.0026) until
static-cap tile overflow (3.6M drops/epoch) corrupts gradients —
PSNR decays 23.7->19.8. Pure L1 on the same protocol climbs monotonically
to 34.9 with scales at init and negligible overflow. Our d_ssim math is
oracle-pinned to the reference's (tests/test_reference_exec.py), so this
was a protocol deviation, not a math bug. The reference recipe also
carries vgg 0.1, which needs pretrained weights (zero-egress), stays off.

Usage: python scripts/validate_tpu_training.py [epochs] [frames]
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_validation(
    epochs: int = 3,
    frames: int = 100,
    res: int = 512,
    tex: int = 256,
    capacity: int = 70_000,
    densify: int = 150,
    prune: int = 200,
    reset: int = 10**9,
    increase_num: int = 1000,
    bake_epochs: int = 0,
    bake_poses: int = 8,
    round_id: str = "0",
    write_artifact: bool = True,
    scale_weight: float = 0.0,
    laplacian_weight: float = 0.0,
    dssim_weight: float = 0.0,
    render_impl: str = "",
    max_per_tile: int = 1024,
    budget_x: int = 2,
    autosize: bool = None,
    section: str = "",
):
    """Run the fidelity protocol and return the artifact dict.

    Library entry point so the slow-tier CPU test
    (tests/test_validation_protocol.py) runs the SAME code path as the
    chip validation, only at reduced frames/capacity (VERDICT r4 item 8).
    """
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

    backend = jax.default_backend()
    if autosize is None:
        autosize = bool(int(os.environ.get("AUTOSIZE", "1")))
    n_verts = min(512, max(96, res))
    flame = synthetic_flame(n_verts=n_verts, n_shape=8, n_exp=6, seed=0)
    mesh = sphere_obj_mesh(n_verts)
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity, img_height=res,
                           img_width=res, normal_offset=0.02)
    render_cfg = RenderConfig(
        impl=render_impl or ("pallas" if backend == "tpu" else "xla"),
        max_per_tile=max_per_tile, chunk=64,
        instance_budget=budget_x * capacity,
        max_tiles_per_gaussian=8,
        # BINNING=twotier: the bench's tail-list binning — every gaussian
        # expands <=4 tiles, only the tail_k largest-footprint expand to
        # the R cap. Optimization transients (single splats at 9+ tiles,
        # the r5 epoch-1 overflow source) are by construction among the
        # per-frame largest, so they land in the tail and never clip,
        # while expansion cost stays ~N*4 instead of N*R.
        binning=os.environ.get("BINNING", "onesort"),
    )

    # ground-truth avatar with randomized appearance. Default is
    # band-limited color over the splats' UV coordinates: real-face
    # appearance is spatially smooth, and the bake gate's premise (a
    # tex^2 UV texture can reproduce the splat render, train/baker.py)
    # only holds for band-limited signals — per-splat white noise
    # (GT_APPEARANCE=noise, the r1-r3 protocol) is unbakeable by
    # construction at ~1 texel/splat and floors baked_psnr at ~21 dB
    # regardless of bake convergence.
    model, gt_params, gt_state = init_fateavatar(mesh, flame, cfg)
    rng = np.random.default_rng(7)
    if os.environ.get("GT_APPEARANCE", "smooth") == "noise":
        feat = rng.uniform(-1.2, 1.2, gt_params.features_dc.shape)
    else:
        uv = np.asarray(model.uvcoords_sample)          # [cap, 2]
        chans = []
        for _ in range(3):
            c = np.zeros(uv.shape[0])
            for _ in range(6):                          # <=6 cycles/texture
                fu, fv = rng.uniform(-6.0, 6.0, 2)
                ph = rng.uniform(0.0, 2.0 * np.pi)
                c += rng.uniform(0.2, 1.0) * np.sin(
                    2.0 * np.pi * (fu * uv[:, 0] + fv * uv[:, 1]) + ph)
            chans.append(c)
        feat = np.stack(chans, -1)
        feat = (1.2 * feat / np.abs(feat).max())[:, None, :]
    gt_params = gt_params.replace(
        features_dc=jnp.asarray(feat, jnp.float32),
        opacity=jnp.full_like(gt_params.opacity, 2.0),
    )

    ds = SyntheticDataset(num_frames=frames, img_res=(res, res), n_shape=8,
                          n_exp=6, seed=1)
    # GT targets render at ROBUST caps (auto 6N budget, R=16), independent
    # of the training caps under test: with a small BUDGET_X the default
    # caps could silently clip the GT itself and the run would train
    # toward corrupted targets while reporting overflow 0 (the training-
    # side overflow counter never sees this jit). Same guard as bench.py's
    # target render.
    gt_render = jax.jit(lambda e, p, cam: fateavatar_forward(
        model, gt_params, gt_state, e, p, cam,
        bg_color=jnp.ones(3),
        render_cfg=render_cfg.replace(instance_budget=0,
                                      max_tiles_per_gaussian=16,
                                      bwd_slots=False))["rgb_image"])
    t0 = time.perf_counter()
    for i in range(frames):
        s = ds.sample(i)
        cam_pose = np.asarray(s["cam_pose"], np.float32)
        # numpy camera: each eager jnp op costs ~a tunnel round trip;
        # make_camera was ~2.4 s/frame of the gt phase on the remote TPU
        cam = make_camera_np(cam_pose[:3, :3].T, cam_pose[:3, 3],
                             s["fovx"], s["fovy"], res, res)
        img = gt_render(jnp.asarray(s["expression"]),
                        jnp.asarray(s["flame_pose"]), cam)
        ds._images[i] = np.asarray(img)
    print(f"[gt] rendered {frames} target frames in "
          f"{time.perf_counter() - t0:.1f}s")

    model2, params, state = init_fateavatar(mesh, flame, cfg)

    # Workload-driven binning caps (VERDICT r5 item 3): instead of the fixed
    # budget_x*capacity the r1-r4 protocol used (2N — measured peak late in
    # the r4 curve was ~2.4 instances/splat, hence the 19.5k-25.8k drops per
    # epoch in VALIDATION_r4.json), probe the true tile occupancy of BOTH
    # endpoint states the run will visit — the init avatar and the GT avatar
    # it converges toward — and size with generous growth headroom
    # (densify events add increase_num splats; scale_max drifted 1.4x over
    # the r4 curve). The CUDA reference never drops an instance (exact
    # per-frame allocation, rasterizer_impl.cu:277-285); target overflow=0.
    resize_log = []
    occ_probe = None
    if autosize:
        from fateavatar_tpu.render.autosize import autosize_render_config
        from fateavatar_tpu.train.step import Frame

        probes = []
        for i in np.linspace(0, frames - 1, 4).astype(int):
            s = ds.sample(int(i))
            cam_pose = np.asarray(s["cam_pose"], np.float32)
            probes.append(Frame(
                expression=jnp.asarray(s["expression"], jnp.float32),
                flame_pose=jnp.asarray(s["flame_pose"], jnp.float32),
                camera=make_camera_np(cam_pose[:3, :3].T, cam_pose[:3, 3],
                                      s["fovx"], s["fovy"], res, res),
                rgb=jnp.zeros((1, 1, 3)), bg_color=jnp.ones(3)))
        # r_headroom=4 (not the module-default 2): the probe sees the init
        # and GT states, but optimization TRANSIENTS push single splats
        # wider — measured on the chip (r5 run 1): probe max 4 tiles/
        # gaussian, training peak 9 by epoch 1 (scale_max 0.0005 -> 0.001
        # while p99 stays at init). R is the expensive knob (candidate
        # expansion scales with N*R; R=32 halved throughput 103 -> 45
        # it/s), so 4x pow2 headroom = R 16 covers the transient without
        # the pow2-bump-after-overflow penalty. The instance budget is
        # cheap (lax.sort is ~0.4 ms at 280k), so 2x total headroom.
        sized = []
        for p_, s_ in ((gt_params, gt_state), (params, state)):
            sized.append(autosize_render_config(
                model2, p_, s_, probes, render_cfg,
                safety=2.0, r_headroom=4, log_fn=print))
        render_cfg = render_cfg.replace(
            instance_budget=max(c.instance_budget for c in sized),
            max_tiles_per_gaussian=max(c.max_tiles_per_gaussian
                                       for c in sized),
            tail_k=max(c.tail_k for c in sized),
        )
        print(f"[autosize] sized caps: instance_budget="
              f"{render_cfg.instance_budget} "
              f"({render_cfg.instance_budget / capacity:.2f}N), "
              f"R={render_cfg.max_tiles_per_gaussian}")

    # default = the r1-r3 protocol loss (rgb + dssim). The REFERENCE
    # recipe (config/fateavatar.yaml loss.weight) is rgb 1.0 + scale 0.1
    # (anisotropy ratio, threshold 9) + laplacian 1e5 + vgg 0.1; vgg
    # needs pretrained weights (zero-egress) so it stays off here.
    loss_fn = FateAvatarLoss(FateAvatarLossConfig(
        rgb_weight=1.0, dssim_weight=dssim_weight,
        scale_weight=scale_weight, scale_threshold=9.0,
        laplacian_weight=laplacian_weight))
    tr = Trainer(
        name="tpu_validate", model=model2, params=params, state=state,
        loss_fn=loss_fn,
        optimizer=fateavatar_optimizers({}),
        train_dataset=ds, workspace=None,
        maint_cfg=MaintenanceConfig(
            densify_interval=densify, prune_interval=prune,
            opacity_reset_interval=reset, increase_num=increase_num,
            max_points_num=capacity),
        render_cfg=render_cfg, snapshot_interval=10**9, scan_unroll=3,
    )
    curve = []
    for _ in range(epochs):
        tr.epoch += 1
        tr.train_epoch()
        stats = dict(tr.last_epoch_stats)
        # collapse diagnostics (VERDICT r4 item 2): where inside the epoch
        # the loss moves, and the splat-population state that could move it
        aux = getattr(tr, "last_epoch_aux", None)
        if aux is not None and "loss" in aux:
            la = np.asarray(aux["loss"])
            stats["loss_first10"] = round(float(la[:10].mean()), 5)
            stats["loss_last10"] = round(float(la[-10:].mean()), 5)
            stats["loss_step_max_jump"] = int(np.argmax(np.abs(np.diff(la))))
        p, st = tr.ts.params, tr.ts.state
        alive = np.asarray(st.alive, bool)
        if alive.any():
            world_scale = np.exp(np.asarray(p.scaling))[alive]
            stats["scale_p50"] = round(float(np.median(world_scale)), 5)
            stats["scale_p99"] = round(
                float(np.percentile(world_scale, 99)), 5)
            stats["scale_max"] = round(float(world_scale.max()), 5)
            op = 1.0 / (1.0 + np.exp(-np.asarray(p.opacity)[alive]))
            stats["opacity_mean"] = round(float(op.mean()), 4)
        curve.append(stats)
        tr.logger.log(f"[diag] {stats}")
        # adaptive backstop (expected unused): if an epoch still overflowed
        # at the probed caps, re-probe the CURRENT splat state and grow the
        # caps before the next epoch (one recompile) — the artifact records
        # every resize so a nonzero-overflow epoch is visible evidence, not
        # a silent approximation
        if autosize and stats.get("overflow", 0):
            # TIGHT re-size from a fresh measurement of the current state
            # (size_caps, not the pow2-bump initial sizer: the r5 chip run
            # showed the bump picks R=32/7.8N after a 15-instance drop and
            # halves throughput; the measured peak needs only ~1.4x slack)
            from fateavatar_tpu.render import binning as _binning
            from fateavatar_tpu.render.autosize import (
                make_occupancy_probe, size_caps,
            )

            grid = _binning.tile_grid(res, res)
            if occ_probe is None:       # one compiled probe for all epochs
                occ_probe = make_occupancy_probe(model2)

            tot = mx = big = 0
            for f in probes:
                t_, m_, b_ = occ_probe(tr.ts.params, tr.ts.state,
                                       f.expression, f.flame_pose, f.camera)
                tot = max(tot, int(jax.device_get(t_)))
                mx = max(mx, int(jax.device_get(m_)))
                big = max(big, int(jax.device_get(b_)))
            bump = 1.2 ** len(resize_log)   # escalate on repeat overflow
            grown = size_caps(tot, mx, capacity, grid[0] * grid[1],
                              tr.render_cfg, safety=1.4 * bump,
                              r_slack=1.4 * bump, big_count=big,
                              big_slack=2.0 * bump)
            new_cfg = tr.render_cfg.replace(
                instance_budget=max(grown.instance_budget,
                                    tr.render_cfg.instance_budget),
                max_tiles_per_gaussian=max(
                    grown.max_tiles_per_gaussian,
                    tr.render_cfg.max_tiles_per_gaussian),
                tail_k=max(grown.tail_k, tr.render_cfg.tail_k))
            if new_cfg == tr.render_cfg:
                # the overflow came from a mid-epoch transient the post-
                # epoch probe no longer sees — grow blind rather than
                # repeat the same caps. Every static cap that can drop
                # instances grows: R, the instance budget, and (twotier)
                # the big-gaussian tail slots — a tail-clip overflow is
                # invisible to R/budget growth.
                new_cfg = tr.render_cfg.replace(
                    max_tiles_per_gaussian=(
                        tr.render_cfg.max_tiles_per_gaussian + 4),
                    instance_budget=int(np.ceil(
                        tr.render_cfg.instance_budget * 1.25 / 4096))
                    * 4096,
                    tail_k=(min(tr.render_cfg.tail_k * 2, capacity)
                            if tr.render_cfg.tail_k else 0))
            if new_cfg != tr.render_cfg:
                tr.set_render_cfg(new_cfg)
                resize_log.append({
                    "epoch": stats["epoch"],
                    "overflow": stats["overflow"],
                    "instance_budget": new_cfg.instance_budget,
                    "R": new_cfg.max_tiles_per_gaussian})
                tr.logger.log(f"[autosize] resized after overflow: "
                              f"{resize_log[-1]}")

    cfg_hash = hashlib.sha256(json.dumps(
        dict(res=res, tex=tex, capacity=capacity, frames=frames,
             epochs=epochs, render=str(render_cfg), backend=backend,
             densify=densify, prune=prune, reset=reset,
             scale_w=scale_weight, lapl_w=laplacian_weight,
             dssim_w=dssim_weight,
             gt=os.environ.get("GT_APPEARANCE", "smooth")),
        sort_keys=True).encode()).hexdigest()[:12]
    artifact = {
        "round": round_id, "backend": backend, "config_hash": cfg_hash,
        "res": res, "capacity": capacity, "frames": frames,
        "gt_appearance": os.environ.get("GT_APPEARANCE", "smooth"),
        "loss": {"rgb": 1.0, "dssim": dssim_weight, "scale": scale_weight,
                 "laplacian": laplacian_weight},
        "cadence": {"densify": densify, "prune": prune, "reset": reset,
                    "increase_num": increase_num},
        "render": {
            "autosize": bool(autosize),
            "instance_budget": tr.render_cfg.instance_budget,
            "budget_over_capacity": round(
                tr.render_cfg.instance_budget / capacity, 2),
            "R": tr.render_cfg.max_tiles_per_gaussian,
            "max_per_tile": max_per_tile,
            "binning": tr.render_cfg.binning,
            "tail_k": tr.render_cfg.tail_k,
            "resizes": resize_log,
        },
        "total_overflow": int(sum(e.get("overflow") or 0 for e in curve)),
        "curve": curve, "final_psnr": curve[-1]["psnr"],
        "best_psnr": max(e["psnr"] for e in curve),
        "steady_its": max(e["its"] for e in curve),
    }

    if bake_epochs > 0:
        artifact["bake"] = _baked_fidelity(
            model2, tr.ts.params, tr.ts.state, loss_fn, ds, tr.render_cfg,
            bake_epochs=bake_epochs, bake_poses=bake_poses,
        )

    if write_artifact:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f"VALIDATION_r{round_id}.json")
        # section-merged write: named sections (grow_to_cap, ...) nest under
        # their key; the main protocol merges at top level — one file per
        # round carries every fidelity artifact
        data = {}
        if os.path.exists(out):
            try:
                with open(out) as f:
                    data = json.load(f)
            except Exception:
                data = {}
        if section:
            data[section] = artifact
        else:
            data.update(artifact)
        with open(out, "w") as f:
            json.dump(data, f, indent=1)
        print(f"[artifact] {out}{'::' + section if section else ''}: "
              f"best PSNR {artifact['best_psnr']:.2f}, "
              f"final {artifact['final_psnr']:.2f}, "
              f"steady {artifact['steady_its']:.1f} it/s, "
              f"total_overflow {artifact['total_overflow']}")
    return artifact


def _baked_fidelity(model, params, state, loss_fn, ds, render_cfg,
                    bake_epochs: int, bake_poses: int):
    """Bake the trained avatar into UV textures and measure how faithfully
    the continuous-texture render reproduces the discrete splat render
    (reference: train/baker.py:120-191 trains to convergence in 5 epochs;
    the baked avatar is SUPPOSED to be a drop-in replacement, so PSNR
    between the two renders is the quality gate — VERDICT r4 item 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fateavatar_tpu.models import fateavatar_forward, uv_decoder as uvd
    from fateavatar_tpu.ops.camera import make_camera_np
    from fateavatar_tpu.train.baker import UVBaker
    from fateavatar_tpu.train.losses import psnr as psnr_fn, ssim as ssim_fn

    t0 = time.perf_counter()
    dec_model, net, net_vars = uvd.build_uv_decoder(
        model, params, state,
        decode_type="UNet", bake_attribute=("color", "opacity"),
    )
    baker = UVBaker(dec_model, net, net_vars, loss_fn, ds,
                    workspace=None, render_cfg=render_cfg)

    # textures/net_vars enter as jit ARGUMENTS, not closure constants:
    # closed-over weights make XLA constant-fold the whole UNet forward at
    # compile time (minutes on the 1-core host; observed in the r4 probe)
    baked_render_v = jax.jit(lambda a_, e, p, cam: uvd.render_from_texture_dict(
        baker.model, a_, e, p, cam, render_cfg=render_cfg)["rgb_image"])
    splat_render = jax.jit(lambda e, p, cam: fateavatar_forward(
        model, params, state, e, p, cam,
        render_cfg=render_cfg)["rgb_image"])

    def eval_baked(act, n_poses):
        from fateavatar_tpu.train.losses import psnr as _psnr
        vals = []
        for i in np.linspace(0, len(ds) - 1, n_poses).astype(int):
            s = ds.sample(int(i))
            cam_pose = np.asarray(s["cam_pose"], np.float32)
            cam = make_camera_np(cam_pose[:3, :3].T, cam_pose[:3, 3],
                                 s["fovx"], s["fovy"],
                                 model.cfg.img_width, model.cfg.img_height)
            e = jnp.asarray(s["expression"])
            p = jnp.asarray(s["flame_pose"])
            vals.append(float(_psnr(baked_render_v(act, e, p, cam),
                                    splat_render(e, p, cam))))
        return float(np.mean(vals))

    # bake in chunks, recording the CONVERGENCE CURVE (VERDICT r5 item 2:
    # the reference's "5 epochs to convergence" is ~15k steps on its ~3k-
    # frame sets, train/baker.py:120-191 — on a small synthetic set the
    # equivalent budget is step-matched via bake_epochs; the curve shows
    # where THIS bake saturates rather than asserting an equivalence)
    n_chunks = min(6, bake_epochs)
    bounds = np.unique(np.linspace(0, bake_epochs, n_chunks + 1).astype(int))
    bake_curve = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        baker.bake(int(b - a))
        _, act_i = baker.textures()
        bake_curve.append({
            "epochs": int(b), "steps": baker.global_step,
            "baked_psnr": round(eval_baked(act_i, 3), 3)})
        print(f"[bake curve] {bake_curve[-1]}")
    _, act = baker.textures()
    baked_render = lambda e, p, cam: baked_render_v(act, e, p, cam)
    # diagnostic split: net-forward render (the training path) vs the
    # texture-export render (the product path). If net_psnr >> baked_psnr
    # the exporter is losing quality; if they track, the gap is bake
    # convergence.
    net_render_v = jax.jit(lambda nv, e, p, cam: uvd.uv_decoder_forward(
        baker.model, baker.net, nv, e, p, cam,
        render_cfg=render_cfg, train=False)[0]["rgb_image"])
    net_render = lambda e, p, cam: net_render_v(baker.net_vars, e, p, cam)

    res = model.cfg.img_height
    psnrs, ssims, net_psnrs = [], [], []
    idx = np.linspace(0, len(ds) - 1, bake_poses).astype(int)
    for i in idx:
        s = ds.sample(int(i))
        cam_pose = np.asarray(s["cam_pose"], np.float32)
        cam = make_camera_np(cam_pose[:3, :3].T, cam_pose[:3, 3],
                             s["fovx"], s["fovy"], res, res)
        e = jnp.asarray(s["expression"])
        p = jnp.asarray(s["flame_pose"])
        a, b = baked_render(e, p, cam), splat_render(e, p, cam)
        psnrs.append(float(psnr_fn(a, b)))
        ssims.append(float(ssim_fn(a, b)))
        net_psnrs.append(float(psnr_fn(net_render(e, p, cam), b)))
    out = {
        "epochs": bake_epochs, "poses": int(len(idx)),
        "baked_psnr": round(float(np.mean(psnrs)), 3),
        "baked_psnr_min": round(float(np.min(psnrs)), 3),
        "baked_ssim": round(float(np.mean(ssims)), 4),
        "net_psnr": round(float(np.mean(net_psnrs)), 3),
        "convergence": bake_curve,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(f"[bake] {out}")
    return out


def main(epochs: int = 3, frames: int = 100):
    maint_on = int(os.environ.get("MAINT", "1"))
    artifact = run_validation(
        epochs=epochs, frames=frames,
        capacity=int(os.environ.get("CAP", "70000")),
        tex=int(os.environ.get("TEX", "256")),
        increase_num=int(os.environ.get("INCREASE", "1000")),
        densify=int(os.environ.get("DENSIFY", "150")) if maint_on else 10**9,
        prune=int(os.environ.get("PRUNE", "200")) if maint_on else 10**9,
        reset=(int(os.environ.get("RESET", str(10**9)))
               if maint_on else 10**9),
        bake_epochs=int(os.environ.get("BAKE", "0")),
        bake_poses=int(os.environ.get("BAKE_POSES", "8")),
        round_id=os.environ.get("VALIDATION_ROUND", "0"),
        scale_weight=float(os.environ.get("SCALE_W", "0.0")),
        laplacian_weight=float(os.environ.get("LAPL_W", "0.0")),
        dssim_weight=float(os.environ.get("DSSIM_W", "0.0")),
        render_impl=os.environ.get("RENDER_IMPL", ""),
        max_per_tile=int(os.environ.get("MAX_PER_TILE", "1024")),
        budget_x=int(os.environ.get("BUDGET_X", "2")),
        section=os.environ.get("VALIDATION_SECTION", ""),
    )

    # Floor on the BEST epoch: the default protocol densifies every 150
    # steps (20x the reference cadence, config/fateavatar.yaml:44) to
    # exercise maintenance inside a 5-epoch run, so the post-densify epochs
    # carry a transient ~0.3-1 dB dip while 1000 fresh splats re-fit; the
    # PRE-densify fit level is the regression signal. Measured r3:
    # best 23.93 at epoch 2, oscillating 22.7-23.7 after each event.
    min_psnr = float(os.environ.get("MIN_PSNR", "23.5"))
    failed = False
    if epochs >= 3 and artifact["best_psnr"] < min_psnr:
        print(f"[FAIL] best PSNR {artifact['best_psnr']:.2f} < {min_psnr}")
        failed = True
    if "bake" in artifact:
        baked_floor = float(os.environ.get("BAKED_MIN_PSNR", "28.0"))
        if artifact["bake"]["baked_psnr"] < baked_floor:
            print(f"[FAIL] baked PSNR {artifact['bake']['baked_psnr']:.2f}"
                  f" < {baked_floor}")
            failed = True
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
