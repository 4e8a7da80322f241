"""Per-op device-trace profile of the full train step on the real TPU.

Captures a jax.profiler trace of the chained bench train step and prints the
top ops by self-time via xprof's framework_op_stats (the only reliable per-op
numbers through the axon tunnel — see .claude/skills/verify/SKILL.md).

Usage: python scripts/profile_train_step.py [steps] [out_json]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    import jax.numpy as jnp
    import numpy as np
    import jax

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
    cfg = FateAvatarConfig(tex_size=tex, capacity=capacity, img_height=res,
                           img_width=res, normal_offset=0.02)
    model, params, state = init_fateavatar(mesh, flame, cfg)
    render_cfg = RenderConfig(impl="pallas", max_per_tile=1024, chunk=64,
                              instance_budget=2 * capacity,
                              max_tiles_per_gaussian=int(os.environ.get("PROF_R", "8")),
                              t_cutoff=float(os.environ.get("PROF_CUTOFF", "0")),
                              bwd_slots=bool(int(os.environ.get("PROF_SLOTS", "0"))),
                              bwd_sorted_scatter=bool(int(os.environ.get("PROF_SORTED", "0"))),
                              bwd_grouped=bool(int(os.environ.get("PROF_GROUPED", "0"))),
                              layout=os.environ.get("PROF_LAYOUT", "compact"),
                              binning=os.environ.get("PROF_BINNING", "onesort"),
                              tail_k=int(os.environ.get("PROF_TAIL_K", "0")))
    if int(os.environ.get("PROF_VGG", "0")):
        from fateavatar_tpu.train.losses import vgg16_random_params

        loss_fn = FateAvatarLoss(
            FateAvatarLossConfig(
                rgb_weight=1.0, vgg_weight=0.1,
                vgg_dtype=os.environ.get("PROF_VGG_DTYPE", "bfloat16") or None),
            vgg_params=vgg16_random_params(jax.random.PRNGKey(0)))
    else:
        loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0,
                                                      dssim_weight=0.25))
    opt = fateavatar_optimizers({})
    if int(os.environ.get("PROF_MAINT", "0")):
        maint = MaintenanceConfig()   # reference cadence, events in-graph
    else:
        maint = MaintenanceConfig(densify_interval=10**9, prune_interval=10**9,
                                  opacity_reset_interval=10**9)
    raw = bool(int(os.environ.get("PROF_SCAN", "0")))
    step = make_train_step(model, loss_fn, opt, maint, render_cfg,
                           return_raw=raw)
    ts = init_train_state(params, state, opt)
    if int(os.environ.get("PROF_STEP0", "0")):
        import jax.numpy as _jnp
        ts = ts.replace(step=_jnp.asarray(
            int(os.environ["PROF_STEP0"]), ts.step.dtype))
    rng = np.random.default_rng(0)
    frame = Frame(
        expression=jnp.zeros((6,), jnp.float32),
        flame_pose=jnp.zeros((15,), jnp.float32),
        camera=make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]),
                           0.8, 0.8, res, res),
        rgb=jnp.asarray(rng.random((res, res, 3)), jnp.float32),
        bg_color=jnp.ones(3),
    )
    return step, ts, frame


def main():
    import jax

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/op_stats.json"
    step, ts, frame = build_step()

    if int(os.environ.get("PROF_SCAN", "0")):
        # profile the SCANNED multi-step program (the bench/scan-epoch path:
        # one dispatch running `steps` chained steps inside lax.scan)
        import functools

        @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def scan_steps(ts, k):
            def body(ts, _):
                ts, aux = step(ts, frame)
                return ts, aux["overflow"]
            return jax.lax.scan(body, ts, None, length=k)

        ts, ovf = scan_steps(ts, steps)          # compile + warm
        jax.block_until_ready(ovf)
        trace_dir = "/tmp/jaxtrace_step"
        with jax.profiler.trace(trace_dir):
            ts, ovf = scan_steps(ts, steps)
            jax.block_until_ready(ovf)
    else:
        # warm up / compile
        for _ in range(3):
            ts, aux = step(ts, frame)
        jax.block_until_ready(aux["loss"])

        trace_dir = "/tmp/jaxtrace_step"
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                ts, aux = step(ts, frame)
            jax.block_until_ready(aux["loss"])

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    xplanes.sort(key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as r2t

    import re

    data, _ = r2t.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    with open(out, "w") as f:
        json.dump(table, f)
    tbl = table[0] if isinstance(table, list) else table
    cols = [c["id"] for c in tbl["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in tbl["rows"]]
    i = {k: cols.index(k) for k in ("category", "tf_op_name",
                                    "total_self_time", "source_info")}
    rows.sort(key=lambda r: -(r[i["total_self_time"]] or 0))
    tot = sum(r[i["total_self_time"]] or 0 for r in rows)
    print(f"device total {tot / 1e3 / steps:.2f} ms/step")
    for r in rows[:20]:
        src = re.sub("<[^>]*>", "", str(r[i["source_info"]]))
        print(f"{(r[i['total_self_time']] or 0) / 1e3 / steps:7.3f} ms  "
              f"{str(r[i['category']])[:14]:14s} "
              f"{str(r[i['tf_op_name']])[:52]:52s} {src}")
    print("saved", out)

    # ---- per-phase bucket table (VERDICT r5 item 4): attribute each op's
    # self-time to a pipeline phase by its source file. Caveat: XLA fuses
    # across phase boundaries and transposed (backward) ops carry their
    # forward op's source line, so "blend" includes its VJP and the split
    # is the compiler's attribution, not a hand-instrumented one.
    buckets = {
        "preprocess.py": "preprocess", "binning.py": "binning",
        "blend_": "blend+vjp", "render.py": "render_facade",
        "losses.py": "loss+vgg", "flame": "flame_deform",
        "fateavatar.py": "model_build", "maintenance.py": "maintenance",
        "optim.py": "optimizer", "step.py": "step_glue",
        "sampling.py": "model_build", "mesh.py": "model_build",
        "quaternion.py": "model_build", "sh.py": "preprocess",
    }
    phase_ms = {}
    for r in rows:
        src = str(r[i["source_info"]])
        t_ms = (r[i["total_self_time"]] or 0) / 1e3 / steps
        name = "other"
        for pat, ph in buckets.items():
            if pat in src:
                name = ph
                break
        phase_ms[name] = phase_ms.get(name, 0.0) + t_ms
    phase_ms = {k: round(v, 3) for k, v in
                sorted(phase_ms.items(), key=lambda kv: -kv[1])}
    env_tag = {k: os.environ.get(k) for k in
               ("PROF_VGG", "PROF_MAINT", "PROF_SCAN", "PROF_BINNING",
                "PROF_TAIL_K", "PROF_R") if os.environ.get(k)}
    table = {
        "device_total_ms_per_step": round(tot / 1e3 / steps, 3),
        "steps": steps,
        "phase_ms": phase_ms,
        "config": {"res": 512, "splats": 65536, "capacity": 70000,
                   **env_tag},
        "backend": jax.default_backend(),
        "note": ("xprof hlo_stats self-time bucketed by source file; "
                 "backward (transposed) ops attribute to their forward "
                 "phase; cross-phase fusions attribute to the fusion "
                 "root"),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ppath = os.path.join(repo, "docs", "artifacts", "profile_phases.json")
    os.makedirs(os.path.dirname(ppath), exist_ok=True)
    with open(ppath, "w") as f:
        json.dump(table, f, indent=1)
    print(f"[artifact] {ppath}: {phase_ms}")


if __name__ == "__main__":
    main()
