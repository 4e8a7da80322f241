"""Workload-driven sizing of the static binning capacities.

The CUDA reference allocates its instance list exactly (``num_rendered``
from an inclusive scan, rasterizer_impl.cu:277-285) because device buffers
can be resized per frame. Under XLA every shape is static, so the binning
capacities — ``instance_budget`` (the compacted candidate list fed to the
sort) and ``max_tiles_per_gaussian`` (the per-gaussian rect-walk cap) —
must be chosen up front. Hand-tuned constants overflow on unseen
workloads; this module measures the actual tile occupancy of a workload
with a cheap probe (preprocess only — no sort, no blend) and sizes the
capacities from the measurement:

    R = pow2ceil(max tiles touched by any gaussian)
    M = ceil(safety * total tiles touched), chunk-aligned

Growth headroom (densification, splat spread during training) is covered
by ``safety`` and by re-probing whenever the renderer's ``overflow``
counter goes nonzero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.render import binning
from fateavatar_tpu.render.preprocess import preprocess


def occupancy_stats(mean2d, depth, radius, grid, r0: int = 4
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(total_instances, max_tiles_per_gaussian, n_big) of one view.
    Pure/jittable. ``n_big`` counts gaussians touching more than ``r0``
    tiles — the population the 'twotier' binning promotes to the full cap.

    ``mean2d`` is [N, 2] or an (mx, my) tuple; dead/culled gaussians carry
    radius 0 and count zero tiles (binning.gaussian_rect semantics).
    """
    del depth  # occupancy is depth-independent; kept for a uniform signature
    rmin_x, rmin_y, rmax_x, rmax_y = binning.gaussian_rect(mean2d, radius, grid)
    visible = radius > 0
    touched = jnp.where(
        visible, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0
    ).astype(jnp.int32)
    return (jnp.sum(touched), jnp.max(touched),
            jnp.sum((touched > r0).astype(jnp.int32)))


def _pow2ceil(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def probe_gaussians(camera, gaussians) -> Tuple[int, int]:
    """Host-side occupancy probe of one splat set under one camera."""
    prep = preprocess(
        camera, gaussians.xyz, gaussians.get_scaling,
        gaussians.get_rotation, gaussians.get_opacity,
        gaussians.get_features, gaussians.sh_degree,
        alive=gaussians.alive, stacked=False,
    )
    mx, my = prep.soa[0], prep.soa[1]
    grid = binning.tile_grid(camera.width, camera.height)
    total, max_t, _ = occupancy_stats((mx, my), prep.depth, prep.radius, grid)
    return int(jax.device_get(total)), int(jax.device_get(max_t))


def autosize_render_config(
    model,
    params,
    state,
    frames,
    base_cfg,
    safety: float = 1.5,
    r_headroom: int = 2,
    chunk_align: int = 4096,
    probe_views: int = 4,
    log_fn=None,
):
    """Return ``base_cfg`` with measured ``instance_budget`` /
    ``max_tiles_per_gaussian``.

    ``frames``: one Frame or a list — the probe renders nothing, it only
    runs preprocess per view (~1 ms each), so probing a handful of views
    is cheap. ``safety`` multiplies the instance budget; ``r_headroom``
    multiplies the per-gaussian rect cap (then pow2-rounded) so moderate
    splat growth during a benched/trained run stays within capacity.
    """
    from fateavatar_tpu.models.fateavatar import build_gaussians

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    frames = frames[:probe_views]

    @jax.jit
    def _stats(params, state, expression, flame_pose, camera,
               world_transform=None):
        g, _, _ = build_gaussians(model, params, state, expression,
                                  flame_pose, world_transform=world_transform)
        prep = preprocess(
            camera, g.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
            g.get_features, g.sh_degree, alive=g.alive, stacked=False,
        )
        grid = binning.tile_grid(camera.width, camera.height)
        return occupancy_stats(
            (prep.soa[0], prep.soa[1]), prep.depth, prep.radius, grid)

    total = max_t = n_big = 0
    for f in frames:
        t, m, nb = _stats(params, state, f.expression, f.flame_pose, f.camera,
                          getattr(f, "world_transform", None))
        total = max(total, int(jax.device_get(t)))
        max_t = max(max_t, int(jax.device_get(m)))
        n_big = max(n_big, int(jax.device_get(nb)))

    n = int(state.alive.shape[0])
    grid = binning.tile_grid(model.cfg.img_width, model.cfg.img_height)
    num_tiles = grid[0] * grid[1]
    R = min(_pow2ceil(max(max_t, 1) * r_headroom), _pow2ceil(num_tiles))
    M = int(np.ceil(total * safety))
    M = max((M + chunk_align - 1) // chunk_align * chunk_align, chunk_align)
    M = min(M, n * R)  # candidate expansion can never exceed N * R
    cfg = base_cfg.replace(instance_budget=M, max_tiles_per_gaussian=R)
    if getattr(base_cfg, "binning", "") == "twotier":
        # one-shot probes (unlike the bench scout) don't see future growth:
        # generous big-gaussian headroom, still far below full N*R
        k = int(np.ceil(max(n_big, 1) * 4 / 256.0)) * 256
        cfg = cfg.replace(tail_k=min(max(k, 256), n))
    if log_fn is not None:
        log_fn(f"[autosize] probe: {total} instances, max {max_t} "
               f"tiles/gaussian -> instance_budget={M} ({M / max(n,1):.2f}N), "
               f"R={R}" + (f", tail_k={cfg.tail_k}"
                           if getattr(base_cfg, 'binning', '') == 'twotier'
                           else ""))
    return cfg


def autosize_from_trainstate(model, ts, frame, base_cfg, **kw):
    """Convenience wrapper for TrainState pytrees (bench/trainer hot path)."""
    return autosize_render_config(model, ts.params, ts.state, frame,
                                  base_cfg, **kw)


def make_occupancy_probe(model, camera=None):
    """Jitted occupancy probe for scouting a training run's true capacity
    needs (preprocess only — ~1 ms per call; no sort, no blend).

    With ``camera`` given (the bench scout): ``(params, state, expression,
    flame_pose) -> (total, max_t, n_big)`` with the camera closed over.
    Without: the camera is a traced argument —
    ``(params, state, expression, flame_pose, camera) -> ...`` — so ONE
    compiled probe serves every view (the validation backstop re-probes
    under multiple cameras across many epochs)."""
    from fateavatar_tpu.models.fateavatar import build_gaussians

    def _stats(params, state, expression, flame_pose, cam):
        g, _, _ = build_gaussians(model, params, state, expression, flame_pose)
        prep = preprocess(
            cam, g.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
            g.get_features, g.sh_degree, alive=g.alive, stacked=False,
        )
        grid = binning.tile_grid(cam.width, cam.height)
        return occupancy_stats(
            (prep.soa[0], prep.soa[1]), prep.depth, prep.radius, grid)

    if camera is not None:
        @jax.jit
        def _probe(params, state, expression, flame_pose):
            return _stats(params, state, expression, flame_pose, camera)
        return _probe

    @jax.jit
    def _probe_cam(params, state, expression, flame_pose, camera):
        return _stats(params, state, expression, flame_pose, camera)
    return _probe_cam


def size_caps(total: int, max_t: int, n: int, num_tiles: int, base_cfg,
              safety: float = 1.08, r_slack: float = 1.25,
              chunk_align: int = 4096, big_count: Optional[int] = None,
              big_slack: float = 2.0):
    """Size ``instance_budget`` / ``max_tiles_per_gaussian`` from a MEASURED
    peak occupancy (e.g. the max over a scouted training span).

    ``max_t`` came from observing every state the sized run will visit, so
    R needs only a small slack (cross-program float reassociation can move
    a splat edge across a tile boundary), NOT a pow2 bump — the candidate
    expansion cost scales with R, and R=32 vs R=12 is ~2x on the whole
    render. R is rounded to a multiple of 4.
    """
    R = int(np.ceil(max(max_t, 1) * r_slack / 4.0)) * 4
    R = min(R, num_tiles)
    M = int(np.ceil(total * safety))
    M = max((M + chunk_align - 1) // chunk_align * chunk_align, chunk_align)
    M = min(M, n * R)
    cfg = base_cfg.replace(instance_budget=M, max_tiles_per_gaussian=R)
    if big_count is not None and getattr(base_cfg, "binning", "") == "twotier":
        k = int(np.ceil(max(big_count, 1) * big_slack / 256.0)) * 256
        cfg = cfg.replace(tail_k=min(max(k, 256), n))
    return cfg
