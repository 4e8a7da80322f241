"""Benchmark harness — run on a real TPU chip by the driver.

Measures the flagship hot path: full FateAvatar training steps at 512x512
on a 65k-splat synthetic avatar fitting a rendered (reachable) target
image, with the REFERENCE loss configuration
(rgb L1 + VGG16 perceptual 0.1 — config/fateavatar.yaml:18-19; the VGG
weights are random here, identical FLOPs to pretrained) and the REFERENCE
maintenance cadence live in the program (densify 3000 / prune 2000 /
opacity-reset 60000, config/fateavatar.yaml:46-48, train/iteration.py:63-85;
the benched span crosses step 6000 so one densify AND one prune actually
fire). Binning capacities are NOT hand-tuned: a scout pass first runs the
WHOLE benched span with robust caps, probing the true tile occupancy every
few steps (render/autosize.py), and the caps are sized from the measured
peak — so the timed run cannot overflow on this workload by construction
(training is deterministic; the scout sees every state the timed run
visits, including the post-densify growth).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N}

``vs_baseline`` is value / 20.0: the BASELINE.md north-star is ">= 2x
RTX3090 training it/s"; the reference publishes no number, so we use a
20 it/s bar (2 x a 10 it/s RTX3090-class estimate for 512x512 65k-splat
3DGS avatar training). The reported value is the MEDIAN of the plausible
timing windows (the remote-TPU tunnel adds 10-20% run-to-run variance and
occasionally drops executions; max/per-dispatch numbers go to stderr as
metadata).
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def _time_windows(run, n, attempts=5):
    """Time ``run(n)`` repeatedly; return (plausible its/s list, dict with
    the summed overflow across all windows)."""
    vals, overflow = [], 0
    for _ in range(attempts):
        t0 = time.perf_counter()
        a = run(n)
        dt = time.perf_counter() - t0
        cur = n / dt
        overflow += a.get("overflow", 0)
        if cur >= 1000:
            print(f"[warn] implausible timing ({cur:.0f} it/s), retrying",
                  file=sys.stderr)
            time.sleep(2)
            continue
        vals.append(cur)
    return vals, {"overflow": overflow}


def main():
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.flame import synthetic_flame
    from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
    from fateavatar_tpu.ops.camera import make_camera
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
    # BENCH_SMOKE=1: tiny shapes for a CPU smoke test of the harness logic
    # (scout -> size -> both timed modes); numbers are meaningless there
    smoke = bool(int(os.environ.get("BENCH_SMOKE", "0")))
    res = 64 if smoke else 512
    tex = 16 if smoke else 256   # 65,536 initial splats at full size
    capacity = 512 if smoke else 70_000
    n_verts = 96 if smoke else 512

    flame = synthetic_flame(n_verts=n_verts, n_shape=8, n_exp=6, seed=0)
    mesh = sphere_obj_mesh(n_verts)
    cfg = FateAvatarConfig(
        tex_size=tex, capacity=capacity, img_height=res, img_width=res,
        normal_offset=0.02,
    )
    model, params, state = init_fateavatar(mesh, flame, cfg)

    base_cfg = RenderConfig(
        impl="pallas" if backend == "tpu" else "xla",
        max_per_tile=1024, chunk=64, binning="twotier",
    )

    rng = np.random.default_rng(0)
    camera = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                         0.8, 0.8, res, res)

    # The training target is a RENDER of the same avatar under a perturbed
    # expression/pose — a reachable image, like fitting a real face. (A
    # random-noise target drives splat scales to their clamp over a few
    # hundred steps — max occupancy ~150 tiles/gaussian — which no real
    # avatar workload does and which would force pathological binning caps.)
    from fateavatar_tpu.models import fateavatar_forward

    tgt_expr = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
    tgt_pose = jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32)
    target = jax.jit(lambda: fateavatar_forward(
        model, params, state, tgt_expr, tgt_pose, camera,
        bg_color=jnp.ones(3),
        render_cfg=base_cfg.replace(instance_budget=0,
                                    max_tiles_per_gaussian=16,
                                    bwd_slots=False),
    )["rgb_image"])()

    frame = Frame(
        expression=jnp.zeros((6,), jnp.float32),
        flame_pose=jnp.zeros((15,), jnp.float32),
        camera=camera,
        rgb=jnp.clip(target, 0.0, 1.0),
        bg_color=jnp.ones(3),
    )

    # ---- PRIMARY: reference loss + reference maintenance cadence ----
    if smoke:   # CPU smoke: the 224^2 VGG stack would dominate the test
        loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0))
    else:
        loss_fn = FateAvatarLoss(
            FateAvatarLossConfig(rgb_weight=1.0, vgg_weight=0.1,
                                 vgg_dtype="bfloat16"),
            vgg_params=vgg16_random_params(jax.random.PRNGKey(0)),
        )
    opt = fateavatar_optimizers({})
    maint = MaintenanceConfig()   # densify 3000 / prune 2000 / reset 60000

    # The benched span: warmup 5900->5960, five 30-step timed windows
    # 5960->6110. The densify(3000) + prune(2000) EVENTS at step 6000 fire
    # inside timed window 2, on top of the every-step stat accumulation.
    START, n, windows = (8, 4, 2) if smoke else (5900, 30, 5)
    span_end = START + 2 * n + windows * n + 10

    # ---- Phase A: scout the span with robust caps, measure peak occupancy
    from fateavatar_tpu.render.autosize import make_occupancy_probe, size_caps

    robust_cfg = base_cfg.replace(instance_budget=0,      # 4N auto
                                  max_tiles_per_gaussian=16,
                                  binning="onesort")
    scout_step = make_train_step(model, loss_fn, opt, maint, robust_cfg)
    probe = make_occupancy_probe(model, frame.camera)
    sts = init_train_state(params, state, opt)
    sts = sts.replace(step=jnp.asarray(START, sts.step.dtype))
    peak_total = peak_maxt = peak_big = 0
    i = int(START)
    while i < span_end:
        t, m, nb = probe(sts.params, sts.state, frame.expression,
                         frame.flame_pose)
        peak_total = max(peak_total, int(jax.device_get(t)))
        peak_maxt = max(peak_maxt, int(jax.device_get(m)))
        peak_big = max(peak_big, int(jax.device_get(nb)))
        for _ in range(10):
            sts, saux = scout_step(sts, frame)
        jax.block_until_ready(saux["loss"])
        if int(saux["overflow"]) > 0:
            print(f"[warn] scout overflow={int(saux['overflow'])} even at "
                  "robust caps", file=sys.stderr)
        i += 10
    del sts

    from fateavatar_tpu.render.binning import tile_grid

    grid = tile_grid(res, res)
    render_cfg = size_caps(peak_total, peak_maxt, capacity, grid[0] * grid[1],
                           base_cfg, big_count=peak_big)
    print(f"[autosize] scouted peak: {peak_total} instances, max {peak_maxt} "
          f"tiles/gaussian, {peak_big} big (>4 tiles) -> "
          f"instance_budget={render_cfg.instance_budget} "
          f"({render_cfg.instance_budget / capacity:.2f}N), "
          f"R={render_cfg.max_tiles_per_gaussian}, "
          f"tail_k={render_cfg.tail_k}", file=sys.stderr)

    step = make_train_step(model, loss_fn, opt, maint, render_cfg)
    raw_step = make_train_step(model, loss_fn, opt, maint, render_cfg,
                               return_raw=True)

    import functools as _ft

    def build_runner(raw_step):
        @_ft.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def scan_steps(ts, k):
            def body(ts, _):
                ts, aux = raw_step(ts, frame)
                return ts, aux["overflow"]
            # unroll=3: amortizes the while-loop's per-iteration sequencing
            # overhead (~0.9 ms/step at this shape); A/B'd 86.4 -> 93.0 it/s
            # (scripts/bench_bwd_ab.py, r3) with unroll=5 only +0.4 more
            return jax.lax.scan(body, ts, None, length=k, unroll=3)

        state_box = {}

        def run(k):
            ts, ovf = scan_steps(state_box["ts"], k)
            jax.block_until_ready(ovf)
            state_box["ts"] = ts
            return {"overflow": int(jnp.sum(ovf))}

        run.box = state_box
        return run

    # ---- Phase B: timed run at the scouted caps ----
    run = build_runner(raw_step)
    ts = init_train_state(params, state, opt)
    run.box["ts"] = ts.replace(step=jnp.asarray(START, ts.step.dtype))
    run(n)   # compiles the k=n scan program AND advances 5900->5930
    run(n)   # plain warmup 5930->5960
    vals, aux = _time_windows(run, n)   # 5960->6110: events in window 2
    if aux is not None and aux["overflow"] > 0:
        print(f"[warn] overflow={aux['overflow']} in benched span "
              "(scout-sized caps exceeded — should be impossible)",
              file=sys.stderr)
    if not vals:
        print("[warn] no plausible timing window; reporting 0",
              file=sys.stderr)
        scan_its = 0.0
    else:
        scan_its = statistics.median(vals)
        print(f"[scan windows] {[f'{v:.1f}' for v in vals]} -> median "
              f"{scan_its:.1f}, max {max(vals):.1f} it/s", file=sys.stderr)

    # ---- per-dispatch stepping: the trainer's other production mode
    # (pipelined per-step dispatches over device-cached frames). Which
    # mode wins depends on the session's tunnel dispatch overhead (1-6 ms)
    # vs the scan program's loop overhead; the trainer can run either, so
    # the headline is the BEST mode (median of windows within a mode).
    dts = init_train_state(params, state, opt)
    dts = dts.replace(step=jnp.asarray(START, dts.step.dtype))
    for _ in range(2 * n):          # warmup through the same span
        dts, daux = step(dts, frame)
    jax.block_until_ready(daux["loss"])

    def run_dispatch(k):
        nonlocal dts
        for _ in range(k):
            dts, daux = step(dts, frame)
        jax.block_until_ready(daux["loss"])
        return {"overflow": int(daux["overflow"])}

    dvals, _ = _time_windows(run_dispatch, n)
    d_its = statistics.median(dvals) if dvals else 0.0
    print(f"[dispatch windows] {[f'{v:.1f}' for v in dvals]} -> median "
          f"{d_its:.1f} it/s", file=sys.stderr)

    its, mode = max((scan_its, "scan"), (d_its, "per-dispatch"))

    # ---- MFU / roofline (VERDICT r5 item 4): ground "fast" in the chip's
    # ceiling, not only the 20 it/s GPU proxy. FLOPs and bytes come from
    # XLA's own cost model of the COMPILED train step (the same numbers
    # the compiler schedules against); achieved rates divide by the
    # measured median step time. Peak table: TPU v5e (v5 lite) 197 bf16
    # TFLOP/s MXU, 819 GB/s HBM; v4 275/1228; v5p 459/2765. Caveat noted
    # in the artifact: the rasterizer core is fp32 (half MXU rate) and
    # XLA's "bytes accessed" counts logical op traffic, not post-fusion
    # HBM traffic — both make pct_peak conservative-to-approximate.
    mfu = None
    if its > 0:
        try:
            compiled = step.lower(
                init_train_state(params, state, opt), frame).compile()
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0))
            acc_bytes = float(cost.get("bytes accessed", 0.0))
            peaks = {
                "TPU v5 lite": (197e12, 819e9),
                "TPU v5e": (197e12, 819e9),
                "TPU v5p": (459e12, 2765e9),
                "TPU v4": (275e12, 1228e9),
            }
            kind = jax.devices()[0].device_kind
            peak_flops, peak_bw = peaks.get(kind, (0.0, 0.0))
            step_s = 1.0 / its
            mfu = {
                "device_kind": kind,
                "gflops_per_step": round(flops / 1e9, 2),
                "gbytes_accessed_per_step": round(acc_bytes / 1e9, 3),
                "achieved_tflops": round(flops / step_s / 1e12, 3),
                "achieved_hbm_gbps": round(acc_bytes / step_s / 1e9, 1),
                "pct_peak_bf16_mxu": (
                    round(100 * flops / step_s / peak_flops, 2)
                    if peak_flops else None),
                "pct_peak_hbm_bw": (
                    round(100 * acc_bytes / step_s / peak_bw, 1)
                    if peak_bw else None),
                "peak_ref": {"bf16_tflops": peak_flops / 1e12 or None,
                             "hbm_gbps": peak_bw / 1e9 or None},
                "note": ("XLA cost-model flops/bytes of the compiled step; "
                         "rasterizer core is fp32 (~1/2 MXU rate), VGG16 "
                         "runs bf16; bytes are logical accesses (pre-"
                         "fusion), so pct_peak_hbm_bw overstates true HBM "
                         "traffic — treat as bounds, see "
                         "docs/artifacts/profile_phases.json for the "
                         "measured per-phase device-time split"),
            }
            print(f"[mfu] {json.dumps(mfu)}", file=sys.stderr)
        except Exception as e:   # tunnel backends may lack cost_analysis
            print(f"[mfu] unavailable: {e!r}", file=sys.stderr)

    # per-phase device-time table, recorded separately on the chip by
    # scripts/profile_train_step.py (xprof trace parse); inlined here so
    # BENCH_r<N>.json carries the breakdown next to the headline number
    phases = None
    try:
        ppath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "artifacts", "profile_phases.json")
        if os.path.exists(ppath):
            with open(ppath) as f:
                phases = json.load(f)
    except Exception:
        phases = None

    # ---- secondary: the round-1 headline config (rgb + DSSIM 0.25), for
    # cross-round comparability ----
    dssim_loss = FateAvatarLoss(
        FateAvatarLossConfig(rgb_weight=1.0, dssim_weight=0.25))
    raw_dssim = make_train_step(model, dssim_loss, opt, maint, render_cfg,
                                return_raw=True)
    run2 = build_runner(raw_dssim)
    ts2 = init_train_state(params, state, opt)
    run2.box["ts"] = ts2.replace(step=jnp.asarray(START, ts2.step.dtype))
    run2(n)   # compile (k=n) + advance
    vals2, _ = _time_windows(run2, n, attempts=1 if smoke else 3)
    if vals2:
        print(f"[secondary] train step rgb+dssim (round-1 headline "
              f"config): {statistics.median(vals2):.1f} it/s",
              file=sys.stderr)

    # ---- secondary: forward-only render FPS (BASELINE config 1/2) ----
    from fateavatar_tpu.models import fateavatar_forward

    fwd = jax.jit(lambda p, s, e, fp: fateavatar_forward(
        model, p, s, e, fp, frame.camera,
        render_cfg=render_cfg.replace(bwd_slots=False),
    )["rgb_image"])
    img = fwd(params, state, frame.expression, frame.flame_pose)
    img.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(30):
        img = fwd(params, state, frame.expression, frame.flame_pose)
    img.block_until_ready()
    fps = 30 / (time.perf_counter() - t0)
    print(f"[secondary] forward-only render: {fps:.1f} fps "
          f"({1000 / fps:.1f} ms/frame)", file=sys.stderr)

    result = {
        "metric": (
            f"FateAvatar train-step it/s ({res}x{res}, {tex * tex} splats, "
            f"{'smoke rgb loss' if smoke else 'reference loss rgb+VGG16(0.1)'}, "
            f"maintenance live, autosized "
            f"binning caps, best trainer mode [{mode}], median of windows, "
            f"{backend}/{render_cfg.resolve_impl()})"
        ),
        "value": round(its, 3),
        "unit": "it/s",
        "vs_baseline": round(its / 20.0, 3),
    }
    if mfu is not None:
        result["mfu"] = mfu
    if phases is not None:
        result["phases"] = phases
    print(json.dumps(result))


if __name__ == "__main__":
    main()
